"""speech_inpainting_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-inpainting framework.

A brand-new implementation of the capabilities of the Fireflies-17/Speech-Inpainting
reference stack (HuBERT SSL encoder + HiFi-GAN decoder, I_ea encoder-adaptation and
I_da decoder-adaptation configurations), designed TPU-first:

- GEMM-native STFT/mel frontend (windowed DFT as a single convolution → MXU)
- flax models with weight-norm parameterization + inference-time folding
- jitted end-to-end inpainting graphs with no per-utterance host round-trips
- SPMD data parallelism over a `jax.sharding.Mesh` (ICI collectives instead of NCCL)
- EMA vector quantization with `psum`-synced codebook statistics

Layout:
  ops/       conv / STFT / mel / resize / masking primitives
  models/    hubert, hifigan, jukebox, codegen (flax.linen)
  quantize/  k-means (apply + minibatch fit), EMA-VQ bottleneck
  losses     centroid + GAN losses
  data/      manifests, datasets, multiseries alignment, host pipeline
  train/     jitted train steps for the 4 reference training loops
  infer/     informed/blind inpainting + resynthesis graphs
  parallel/  mesh + sharding helpers (dist.py-equivalent API)
  convert/   HF / fairseq / torch-HiFi-GAN / joblib-kmeans checkpoint importers
  metrics/   host-side evaluation (SI-SDR, log-spectral, cosine accuracy, ...)
"""

__version__ = "0.1.0"

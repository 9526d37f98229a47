"""Informed speech inpainting: the I_ea flagship inference graph, fully jitted.

Re-designs the reference predict path (I_ea/predict.py:58-207) as ONE
accelerator graph — wav in, wav out, no per-utterance host round-trips:

    wav22 ─ mask ─ normalize·0.95 ─ mel(hop441) ───────────────┐ splice ─ extend ─ HiFi-GAN ─ wav
    wav16 ─ mask ─ zero-mean/unit-var ─ HuBERT+head ─ nearest centroid ┘

Reference conventions matched:
  - 22.05 kHz mask span [pos·441, (pos+len)·441)  (predict.py:99-104;
    320·22050/16000 = 441 exactly)
  - 16 kHz mask span [pos·320+80, (pos+len)·320−1) (predict.py:133)
  - inf-norm ×0.95 on the masked 22k wave (librosa normalize, predict.py:104)
  - HF AutoProcessor zero-mean/unit-var on the 16k wave (predict.py:136-141,
    hubert-large-ls960-ft do_normalize=True)
  - predicted mel frames = centered centroid[argmax cos] + codebook mean
    (predict.py:184-189), spliced over [pos, pos+len) mel frames
  - bilinear 441→256 regrid (extend_mel) before the generator

`mask_pos`/`mask_len` are traced scalars: any mask position/length reuses one
compiled graph (frame grid of hop-441 mel == HuBERT 20 ms frame grid).

All model parameters are passed as jit ARGUMENTS (donated device residents),
never closure constants — constants would be baked into the serialized HLO,
which breaks remote-compile backends and bloats every compile.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.hifigan import Generator, HiFiGANConfig
from ..models.hubert import EncoderWithHead, HubertConfig
from ..ops.masking import frame_mask, mask_span, mask_wave_frames
from ..ops.mel import HUBERT_ALIGNED_MEL_22K, mel_spectrogram
from ..ops.resize import extend_mel


def peak_normalize(x, level: float = 0.95, eps: float = 1e-10):
    """librosa.util.normalize(x) * level (inf-norm)."""
    return x * (level / jnp.maximum(jnp.max(jnp.abs(x), axis=-1,
                                            keepdims=True), eps))


def meanvar_normalize(x, eps: float = 1e-7):
    """HF Wav2Vec2FeatureExtractor do_normalize: (x−μ)/√(σ²+1e-7)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps)


@dataclasses.dataclass(frozen=True)
class InpainterConfig:
    hubert: HubertConfig
    hifigan: HiFiGANConfig
    normalize_16k: bool = True  # HF processor do_normalize
    # serving-engine options: fold weight norm once (models/hifigan_fast.py)
    # and run winning resblocks through the fused Pallas kernel
    fast_generator: bool = False
    pallas_max_channels: int = 0
    pallas_skip: frozenset = frozenset()


def _masked_mel22(wav22, mask_pos, mask_len):
    masked22 = jax.vmap(mask_span)(wav22, mask_pos * 441, mask_len * 441)
    return mel_spectrogram(peak_normalize(masked22), HUBERT_ALIGNED_MEL_22K)


def _splice(mel, frames_btd, mask_pos, mask_len):
    """Replace mel frames inside [pos, pos+len) with frames_btd (B, T, 80),
    padding/truncating the replacement stream to the mel frame count."""
    n_frames = mel.shape[-1]
    t = frames_btd.shape[1]
    if t < n_frames:
        frames_btd = jnp.pad(frames_btd, ((0, 0), (0, n_frames - t), (0, 0)))
    else:
        frames_btd = frames_btd[:, :n_frames]
    m = jax.vmap(frame_mask, in_axes=(None, 0, 0))(n_frames, mask_pos,
                                                   mask_len)
    return jnp.where(m[:, None, :], jnp.swapaxes(frames_btd, 1, 2), mel)


class InformedInpainter:
    """Jit-compiled informed inpainting. Construct once, call per utterance.

    centroids: (K, 80) mel codebook (uncentered; centering follows the
    reference LossFunction). Shapes are static per (len(wav22), len(wav16))
    pair — pad/bucket upstream for batch sweeps.
    """

    def __init__(self, cfg: InpainterConfig, hubert_params, generator_params,
                 centroids, *, generator=None, mesh=None):
        """`generator` overrides the vocoder module (same (B, in_dim, F) →
        (B, 1, T) contract — e.g. models.hifigan_istft.ISTFTGenerator, the
        fast-vocoder family trained on the identical recipe).

        `mesh`: optional jax.sharding.Mesh for data-parallel batch serving —
        the SPMD replacement for the reference's Pool(8) inference workers
        (I_da/scripts/inference.py:311-327): params/codebook are replicated
        once at construction, every `batch()` shards its inputs over the
        mesh's 'dp' axis, and the one jitted graph runs on all chips (batch
        size must divide by the mesh size). Single-device behavior is
        unchanged when mesh is None."""
        self.cfg = cfg
        self._hubert = EncoderWithHead(cfg.hubert, out_dim=centroids.shape[-1])
        self._hubert_params = hubert_params
        if generator is not None:
            assert not cfg.fast_generator, \
                "generator override and fast_generator are exclusive"
            self._gen_apply = lambda gp, mel: generator.apply(
                {"params": gp}, mel)
            self._gen_params = generator_params
        elif cfg.fast_generator:
            from ..models.hifigan_fast import FastGenerator
            engine = FastGenerator.from_params(
                cfg.hifigan, generator_params,
                pallas_max_channels=cfg.pallas_max_channels,
                pallas_skip=cfg.pallas_skip)
            self._gen_apply = engine.apply
            self._gen_params = engine.folded
        else:
            gen = Generator(cfg.hifigan)
            self._gen_apply = lambda gp, mel: gen.apply({"params": gp}, mel)
            self._gen_params = generator_params
        C = jnp.asarray(centroids, jnp.float32)
        self._center = C.mean(axis=0)
        self._C_centered = C - self._center[None, :]
        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import replicate
            (self._hubert_params, self._gen_params, self._C_centered,
             self._center) = replicate(mesh, (
                 self._hubert_params, self._gen_params, self._C_centered,
                 self._center))
        self._graph = jax.jit(self._graph_impl)
        self._expected_graph = jax.jit(self._expected_impl)
        self._hifi_masked_graph = jax.jit(self._hifi_masked_impl)

    def _shard(self, *batch_arrays):
        """Place batch inputs sharded over the mesh's 'dp' axis (no-op
        without a mesh); XLA propagates the sharding through the graph.
        Batches that don't divide the 'dp' axis — only that axis, so a
        composed ('dcn','dp') mesh still shards B=dp-multiple batches —
        fall back to replicated placement (e.g. the single-utterance
        `__call__` path, B=1): correct, just not distributed."""
        if self._mesh is None:
            return batch_arrays
        from ..parallel.mesh import replicate, shard_batch
        dp = dict(self._mesh.shape).get("dp")
        if dp is None or batch_arrays[0].shape[0] % dp != 0:
            return replicate(self._mesh, batch_arrays)
        return shard_batch(self._mesh, batch_arrays)

    # --- pure graphs (params are arguments, not constants) ---------------

    def _graph_impl(self, hp, gp, Cc, center, wav22, wav16, mask_pos,
                    mask_len):
        """Batched graph: wav22 (B,T22), wav16 (B,T16), mask_pos/len (B,)."""
        cfg = self.cfg
        mel = _masked_mel22(wav22, mask_pos, mask_len)        # (B, 80, F)

        # --- 16 kHz branch: HuBERT prediction of masked frames ---------
        masked16 = jax.vmap(mask_wave_frames)(wav16, mask_pos, mask_len)
        if cfg.normalize_16k:
            masked16 = meanvar_normalize(masked16)
        emb = self._hubert.apply({"params": hp}, masked16)    # (B, T, 80)

        # nearest centroid by centered cosine sim (LossFunction.cos_sim)
        en = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
        cn = Cc / jnp.maximum(
            jnp.linalg.norm(Cc, axis=-1, keepdims=True), 1e-8)
        pred_labels = jnp.argmax(en @ cn.T, axis=-1)          # (B, T)
        pred_mels = Cc[pred_labels] + center                  # (B, T, 80)

        inpainted_mel = _splice(mel, pred_mels, mask_pos, mask_len)
        wav = self._gen_apply(gp, extend_mel(inpainted_mel))
        return dict(inpainted=wav[:, 0], mel_masked=mel,
                    mel_inpainted=inpainted_mel, pred_labels=pred_labels)

    def _expected_impl(self, gp, Cc, center, wav22, labels, mask_pos,
                       mask_len):
        """Reference 'expected_inpaint': splice the TRUE centroid frames
        (predict.py:175-189) — the decoder-only upper bound."""
        mel = _masked_mel22(wav22, mask_pos, mask_len)
        exp_mels = Cc[labels] + center                        # (B, T, 80)
        exp_mel = _splice(mel, exp_mels, mask_pos, mask_len)
        wav = self._gen_apply(gp, extend_mel(exp_mel))
        return dict(expected_inpaint=wav[:, 0], mel_expected=exp_mel)

    def _hifi_masked_impl(self, gp, wav22, mask_pos, mask_len):
        """Reference 'hifi_masked.wav': vocode the masked mel as-is."""
        mel = _masked_mel22(wav22, mask_pos, mask_len)
        wav = self._gen_apply(gp, extend_mel(mel))
        return wav[:, 0]

    # --- user API ---------------------------------------------------------

    def __call__(self, wav22, wav16, mask_pos, mask_len):
        """Single utterance: wav22 (T22,), wav16 (T16,) float32;
        mask_pos/mask_len in 20 ms frames. Returns dict of device arrays."""
        out = self.batch(jnp.asarray(wav22, jnp.float32)[None],
                         jnp.asarray(wav16, jnp.float32)[None],
                         jnp.asarray(mask_pos, jnp.int32)[None],
                         jnp.asarray(mask_len, jnp.int32)[None])
        return jax.tree_util.tree_map(lambda x: x[0], out)

    def batch(self, wav22, wav16, mask_pos, mask_len):
        """Batched: wav22 (B,T22), wav16 (B,T16), mask_pos/len (B,).
        With a mesh, the batch is sharded over 'dp' (B % mesh size == 0)."""
        return self._graph(self._hubert_params, self._gen_params,
                           self._C_centered, self._center,
                           *self._shard(jnp.asarray(wav22, jnp.float32),
                                        jnp.asarray(wav16, jnp.float32),
                                        jnp.asarray(mask_pos, jnp.int32),
                                        jnp.asarray(mask_len, jnp.int32)))

    def batch_expected(self, wav22, target_labels, mask_pos, mask_len):
        """Batched oracle: target_labels (B, F) are the TRUE centroid ids on
        the full mel frame grid (only the masked span is spliced in)."""
        return self._expected_graph(
            self._gen_params, self._C_centered, self._center,
            *self._shard(jnp.asarray(wav22, jnp.float32),
                         jnp.asarray(target_labels, jnp.int32),
                         jnp.asarray(mask_pos, jnp.int32),
                         jnp.asarray(mask_len, jnp.int32)))

    def expected_inpaint(self, wav22, target_labels, mask_pos, mask_len):
        out = self._expected_graph(
            self._gen_params, self._C_centered, self._center,
            jnp.asarray(wav22, jnp.float32)[None],
            jnp.asarray(target_labels, jnp.int32)[None],
            jnp.asarray(mask_pos, jnp.int32)[None],
            jnp.asarray(mask_len, jnp.int32)[None])
        return jax.tree_util.tree_map(lambda x: x[0], out)

    def hifi_masked(self, wav22, mask_pos, mask_len):
        return self._hifi_masked_graph(
            self._gen_params, jnp.asarray(wav22, jnp.float32)[None],
            jnp.asarray(mask_pos, jnp.int32)[None],
            jnp.asarray(mask_len, jnp.int32)[None])[0]

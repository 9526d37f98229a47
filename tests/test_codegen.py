"""Parity tests: flax jukebox Encoder/Decoder, FoVQVAE, and CodeGenerator vs
the reference torch implementations (random weights through the converter)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech_inpainting_tpu.models.codegen import (CodeGenerator,
                                                  CodeGeneratorConfig,
                                                  FoVQVAE, FoVQVAEConfig,
                                                  repeat_upsample)
from speech_inpainting_tpu.models.jukebox import (ConvStackConfig, Decoder,
                                                  Encoder)
from speech_inpainting_tpu.convert.ida_torch import (convert_code_generator,
                                                     convert_decoder,
                                                     convert_encoder,
                                                     convert_fo_vqvae)

from reference_loader import AttrDict, ref_ida_modules, seed_all

STACK = dict(input_emb_width=1, output_emb_width=16, levels=1, downs_t=[2],
             strides_t=[2], width=8, depth=2, m_conv=1.0,
             dilation_growth_rate=3)
VQ = dict(l_bins=6, emb_width=16, mu=0.99, levels=1)
F0Q = {"f0_vq_params": VQ, "f0_encoder_params": STACK,
       "f0_decoder_params": STACK}


def test_encoder_parity(rng):
    seed_all()
    _, jb, _, _ = ref_ida_modules()
    te = jb.Encoder(**STACK).eval()
    cfg = ConvStackConfig.from_dict(STACK)
    params = convert_encoder(te.state_dict(), "", cfg)
    x = rng.standard_normal((2, 1, 64)).astype(np.float32)
    with torch.no_grad():
        want = te(torch.from_numpy(x))
    got = Encoder(cfg).apply({"params": params}, jnp.asarray(x))
    assert len(got) == len(want) == 1
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("reverse", [False, True], ids=["fwd", "revdil"])
def test_decoder_parity(rng, reverse):
    seed_all()
    _, jb, _, _ = ref_ida_modules()
    kw = dict(STACK, reverse_decoder_dilation=reverse)
    td = jb.Decoder(**kw).eval()
    cfg = ConvStackConfig.from_dict(kw)
    params = convert_decoder(td.state_dict(), "", cfg)
    x = rng.standard_normal((2, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = td([torch.from_numpy(x)])
    got = Decoder(cfg).apply({"params": params}, [jnp.asarray(x)])
    assert got.shape == tuple(want.shape) == (2, 1, 64)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def make_ref_fo_vqvae():
    _, _, _, model = ref_ida_modules()
    h = AttrDict({"f0_vq_params": VQ, "f0_encoder_params": STACK,
                  "f0_decoder_params": STACK})
    m = model.FoVQVAE(h).eval()
    # give the (uninitialized) VQ codebook real values, as a checkpoint would
    torch.manual_seed(7)
    for blk in m.vq.level_blocks:
        blk.k = torch.randn(VQ["l_bins"], VQ["emb_width"])
        blk.init = True
    return m


def test_fo_vqvae_parity(rng):
    seed_all()
    tm = make_ref_fo_vqvae()
    cfg = FoVQVAEConfig.from_dict(F0Q)
    params, vq_tree = convert_fo_vqvae(tm.state_dict(), cfg)
    # state dict holds only `k`; restore_k() mirrors the reference load path
    f0 = rng.standard_normal((2, 1, 64)).astype(np.float32)
    with torch.no_grad():
        want, commits, _ = tm(f0=torch.from_numpy(f0))
    got, gcommits, _ = FoVQVAE(cfg).apply(
        {"params": params, "vq": vq_tree}, jnp.asarray(f0), train=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(float(gcommits[0]), float(commits[0]),
                               rtol=1e-4)


def test_code_generator_parity(rng):
    seed_all()
    _, _, _, model = ref_ida_modules()
    hifi = dict(resblock="1", upsample_rates=[5, 4], upsample_kernel_sizes=[11, 8],
                upsample_initial_channel=32, resblock_kernel_sizes=[3],
                resblock_dilation_sizes=[[1, 3, 5]], model_in_dim=48,
                num_embeddings=10, embedding_dim=16, multispkr="_",
                f0_stats="yes", f0_normalize=True, f0_quantizer_path=None,
                f0_quantizer=F0Q, sampling_rate=16000,
                lambda_commit_code=0, spk_embeddings=4)
    h = AttrDict(hifi)
    tm = model.CodeGenerator(h).eval()
    # reference loads fo_vqvae from checkpoint when f0_quantizer_path is set;
    # build it manually here with random weights + a real codebook
    tm.fo_vqvae = make_ref_fo_vqvae()
    tm.emb_p = torch.nn.Embedding(VQ["l_bins"], hifi["embedding_dim"])

    cfg = CodeGeneratorConfig.from_dict(dict(hifi, f0_quantizer=F0Q,
                                             f0_stats="yes"))
    params, vq_tree = convert_code_generator(tm.state_dict(), cfg)

    B, F = 2, 16
    code = rng.integers(0, 10, (B, F))
    f0 = rng.standard_normal((B, 1, F * 4)).astype(np.float32)
    emb = rng.standard_normal((B, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(code=torch.from_numpy(code), f0=torch.from_numpy(f0),
                  emb=torch.from_numpy(emb),
                  spkr=torch.zeros(B, 1, dtype=torch.long))
    got = CodeGenerator(cfg).apply(
        {"params": params, "vq": vq_tree}, jnp.asarray(code),
        f0=jnp.asarray(f0), emb=jnp.asarray(emb))
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_repeat_upsample_semantics(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    got = np.asarray(repeat_upsample(jnp.asarray(x), 12))
    # torch: unsqueeze(3).repeat(1,1,1,r).view -> frame-wise repeat
    want = torch.from_numpy(x).unsqueeze(3).repeat(1, 1, 1, 3).view(2, 3, 12)
    np.testing.assert_array_equal(got, want.numpy())
    v = rng.standard_normal((2, 5)).astype(np.float32)
    got2 = np.asarray(repeat_upsample(jnp.asarray(v), 8))
    assert got2.shape == (2, 5, 8)
    with pytest.raises(NotImplementedError):
        repeat_upsample(jnp.asarray(x), 13)


def test_content_vq_regime(rng):
    """lambda_commit_code regime: encoder+VQ content path, int dequantize,
    and unit extraction (model.py:134-141, infer_vqvae_codes)."""
    import jax
    import jax.numpy as jnp
    hifi = HiFiGANConfig_tiny = __import__(
        "speech_inpainting_tpu.models.hifigan",
        fromlist=["HiFiGANConfig"]).HiFiGANConfig(
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),), in_dim=16, sampling_rate=16000)
    stack = ConvStackConfig(input_emb_width=1, output_emb_width=16, levels=1,
                            downs_t=(2,), strides_t=(2,), width=8, depth=1,
                            dilation_growth_rate=3)
    cfg = CodeGeneratorConfig(hifigan=hifi, multispkr=False, use_f0=False,
                              f0_quantizer=None, code_encoder=stack,
                              code_vq_bins=6, code_vq_width=16)
    m = CodeGenerator(cfg)
    x = jnp.asarray(rng.standard_normal((2, 1, 64)).astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
               x, train=True)
    wav, commit, metrics = m.apply(
        {"params": v["params"], "vq": v["vq"]}, x, train=False)
    assert wav.shape == (2, 1, 16 * 4)  # 64/4 encoder frames * 4 upsample
    assert np.isfinite(float(commit))

    units = m.apply({"params": v["params"], "vq": v["vq"]}, x,
                    method=CodeGenerator.encode_codes)
    assert units.shape == (2, 16) and int(units.max()) < 6

    # int unit input dequantizes straight through the codebook
    wav2, commit2, _ = m.apply({"params": v["params"], "vq": v["vq"]},
                               jnp.asarray(units), train=False)
    assert wav2.shape == wav.shape and commit2 is None

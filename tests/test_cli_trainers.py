"""Trainer-CLI smoke tests: every `sit-train-*` entry point runs one tiny
epoch end-to-end through arg parsing, config construction, dataset build,
step compile, and checkpoint write. These pin the WIRING (flag plumbing,
config-json schemas, dataset/manifest formats the reference users bring)
— the numerics of the underlying steps are pinned by the train/* tests."""
import json

import numpy as np
import pytest

from speech_inpainting_tpu.data import audio as A


@pytest.fixture
def wavdir22(tmp_path, rng):
    d = tmp_path / "wavs22"
    d.mkdir()
    for i in range(3):
        t = np.arange(22050) / 22050.0
        wav = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)).astype(
            np.float32)
        A.save_wav(d / f"u{i}.wav", wav, 22050)
    return d


TINY_V1 = dict(resblock="1", upsample_rates=[8, 8, 2, 2],
               upsample_kernel_sizes=[16, 16, 4, 4],
               upsample_initial_channel=32, resblock_kernel_sizes=[3],
               resblock_dilation_sizes=[[1, 3, 5]], num_mels=80,
               sampling_rate=22050)


def test_train_hifigan_cli_vanilla(tmp_path, wavdir22):
    from speech_inpainting_tpu.cli import train_hifigan
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(TINY_V1))
    ckpt = tmp_path / "ckpt"
    # u2 held out as the validation sweep target (train.py:218-246 path),
    # firing every step at --validation-interval 1
    (tmp_path / "train.txt").write_text("u0\nu1\n")
    (tmp_path / "val.txt").write_text("u2\n")
    train_hifigan.main([
        "--wavs", str(wavdir22), "--config", str(cfgp),
        "--filelist", str(tmp_path / "train.txt"),
        "--valid-filelist", str(tmp_path / "val.txt"),
        "--validation-interval", "1", "--log-dir", str(tmp_path / "tb"),
        "--checkpoint-path", str(ckpt), "--segment-size", "512",
        "--batch-size", "2", "--epochs", "1"])
    names = {p.name for p in ckpt.iterdir()}
    assert any(n.startswith("g_") for n in names), names
    assert any(n.startswith("do_") for n in names), names
    # the sweep wrote its scalar AND the reference's TB media
    # (train.py:228-246): synthesized validation audio + mel figure
    blob = b"".join(p.read_bytes()
                    for p in (tmp_path / "tb").glob("events.out.tfevents.*"))
    for tag in (b"validation/mel_error", b"validation/audio",
                b"validation/mel"):
        assert tag in blob, tag


def test_train_hifigan_cli_modified(tmp_path, wavdir22, rng):
    from speech_inpainting_tpu.cli import train_hifigan
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(TINY_V1))
    km = tmp_path / "km.npy"
    np.save(km, rng.standard_normal((10, 80)).astype(np.float32))
    ckpt = tmp_path / "ckpt_mod"
    train_hifigan.main([
        "--wavs", str(wavdir22), "--config", str(cfgp), "--modified",
        "--kmeans", str(km), "--mask-len", "1",
        "--checkpoint-path", str(ckpt), "--segment-size", "2048",
        "--batch-size", "2", "--epochs", "1"])
    assert any(p.name.startswith("g_") for p in ckpt.iterdir())


def test_train_hifigan_cli_fine_tuning(tmp_path, wavdir22):
    """Teacher-mel regime (train.py --fine_tuning + meldataset.py:137-168):
    generator input mels come from .npy dumps, crops are mel-aligned."""
    import jax.numpy as jnp
    from speech_inpainting_tpu.cli import train_hifigan
    from speech_inpainting_tpu.ops.mel import VOCODER_MEL_22K, mel_spectrogram

    mels = tmp_path / "teacher_mels"
    mels.mkdir()
    for p in sorted(wavdir22.glob("*.wav")):
        wav, _ = A.load_wav(p)
        np.save(mels / f"{p.stem}.npy",
                np.asarray(mel_spectrogram(jnp.asarray(wav)[None],
                                           VOCODER_MEL_22K))[0])
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(TINY_V1))
    ckpt = tmp_path / "ckpt_ft"
    train_hifigan.main([
        "--wavs", str(wavdir22), "--config", str(cfgp), "--fine-tuning",
        "--input-mels-dir", str(mels),
        "--checkpoint-path", str(ckpt), "--segment-size", "512",
        "--batch-size", "2", "--epochs", "1"])
    assert any(p.name.startswith("g_") for p in ckpt.iterdir())


def test_teacher_mel_crops_are_hop_aligned(tmp_path, rng):
    """Every emitted (audio, mel) pair is a matching hop-aligned window of
    the source: audio[a*hop : a*hop+seg] with mel[:, a:a+seg/hop]
    (meldataset.py:159-163); short utterances pad both (:165-167)."""
    from speech_inpainting_tpu.cli.train_hifigan import CropDataset

    d = tmp_path / "wavs"
    d.mkdir()
    hop, seg = 4, 16
    fps = seg // hop
    # u0 long (croppable), u1 shorter than one segment (pad branch)
    A.save_wav(d / "u0.wav", (np.arange(50, dtype=np.float32) + 1) / 100,
               22050)
    A.save_wav(d / "u1.wav", -(np.arange(10, dtype=np.float32) + 1) / 100,
               22050)
    w0, _ = A.load_wav(d / "u0.wav")      # 16-bit roundtrip = what ds holds
    w1, _ = A.load_wav(d / "u1.wav")
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    mel0 = rng.standard_normal((3, len(w0) // hop)).astype(np.float32)
    mel1 = rng.standard_normal((3, len(w1) // hop)).astype(np.float32)
    np.save(mels_dir / "u0.npy", mel0)
    np.save(mels_dir / "u1.npy", mel1)

    ds = CropDataset(sorted(d.glob("*.wav")), seg, normalize=False,
                     mels_dir=mels_dir, hop=hop)
    for epoch in range(4):
        (batch,) = list(ds.batches(2, epoch=epoch))
        assert batch["audio"].shape == (2, 1, seg)
        assert batch["mel"].shape == (2, 3, fps)
        for audio, mel in zip(batch["audio"][:, 0], batch["mel"]):
            if audio.min() < 0:                      # u1: the pad branch
                assert np.array_equal(audio, np.pad(w1, (0, seg - len(w1))))
                assert np.array_equal(
                    mel, np.pad(mel1, ((0, 0), (0, fps - mel1.shape[1]))))
            else:                                    # u0: aligned crop
                a = int(round(float(audio[0]) * 100)) - 1
                assert a % hop == 0 and a // hop <= mel0.shape[1] - fps - 1
                assert np.array_equal(audio, w0[a:a + seg])
                assert np.array_equal(mel, mel0[:, a // hop:a // hop + fps])


def test_train_ea_cli(tmp_path, rng, monkeypatch):
    from speech_inpainting_tpu.cli import train_ea
    from speech_inpainting_tpu.models.hubert import HubertConfig
    tiny = HubertConfig(conv_dim=(8,) * 7, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=2)
    monkeypatch.setattr(HubertConfig, "base", staticmethod(lambda **o: tiny))

    wavs = tmp_path / "wavs16"
    wavs.mkdir()
    max_len = int(0.2 * 16000) + 3
    frames = (max_len - 80) // 320
    names = []
    for i in range(2):
        A.save_wav(wavs / f"u{i}.wav",
                   rng.standard_normal(3000).astype(np.float32) * 0.2, 16000)
        names.append(f"u{i}")
    labels = tmp_path / "labels"
    labels.mkdir()
    for n in names:
        np.save(labels / f"{n}_labels.npy",
                rng.integers(0, 10, frames).astype(np.int32))
    split = tmp_path / "training.txt"
    split.write_text("\n".join(names) + "\n")
    km = tmp_path / "km.npy"
    np.save(km, rng.standard_normal((10, 80)).astype(np.float32))

    ckpt = tmp_path / "ckpt_ea"
    train_ea.main([
        "--wavs", str(wavs), "--split", str(split),
        "--labels-dir", str(labels), "--kmeans", str(km),
        "--checkpoint-path", str(ckpt), "--hubert-type", "base",
        "--batch-size", "2", "--epochs", "1", "--mask-length", "3",
        "--max-wav-seconds", "0.2"])
    names = {p.name for p in ckpt.iterdir()}
    assert any(n.startswith("ea_") for n in names), names
    assert any(n.startswith("last_") for n in names), names


F0_STACK = dict(input_emb_width=1, output_emb_width=16, levels=1,
                downs_t=[2], strides_t=[2], width=8, depth=1, m_conv=1.0,
                dilation_growth_rate=3)


def test_train_f0vq_cli(tmp_path, rng):
    from speech_inpainting_tpu.cli import train_f0vq
    wavs = []
    for i in range(2):
        p = tmp_path / f"s{i}_u.wav"
        t = np.arange(8000) / 16000.0
        A.save_wav(p, (0.3 * np.sin(2 * np.pi * (120 + 30 * i) * t)).astype(
            np.float32), 16000)
        wavs.append(p)
    manifest = tmp_path / "train.txt"
    manifest.write_text("\n".join(str(p) for p in wavs) + "\n")
    cfgp = tmp_path / "f0vq.json"
    cfgp.write_text(json.dumps(dict(
        f0_encoder_params=F0_STACK, f0_decoder_params=F0_STACK,
        f0_vq_params=dict(l_bins=8, emb_width=16, mu=0.99, levels=1),
        segment_size=1600, batch_size=2)))
    ckpt = tmp_path / "ckpt_f0"
    train_f0vq.main(["--config", str(cfgp), "--train-manifest",
                     str(manifest), "--checkpoint-path", str(ckpt),
                     "--epochs", "1", "--cache-dir", str(tmp_path / "c")])
    assert any(p.name.startswith("g_") for p in ckpt.iterdir())


def test_train_da_cli(tmp_path, rng):
    from speech_inpainting_tpu.cli import train_da
    # decoder-only regime (no f0/speaker paths): generator total upsample
    # (2*2=4) == code_hop_size so the synthesized waveform matches the crop
    h = dict(resblock="1", upsample_rates=[2, 2],
             upsample_kernel_sizes=[4, 4], upsample_initial_channel=16,
             resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
             model_in_dim=16, num_embeddings=10, embedding_dim=16,
             multispkr=None, f0_stats=None, lambda_commit_code=0,
             sampling_rate=16000, segment_size=2560, code_hop_size=4,
             batch_size=2, num_mels=80, n_fft=1024, hop_size=256,
             win_size=1024, fmin=0, fmax_for_loss=None)
    cfgp = tmp_path / "da.json"
    cfgp.write_text(json.dumps(h))
    entries = []
    for i in range(2):
        p = tmp_path / f"s{i}_u.wav"
        t = np.arange(8000) / 16000.0
        A.save_wav(p, (0.3 * np.sin(2 * np.pi * (120 + 30 * i) * t)).astype(
            np.float32), 16000)
        units = rng.integers(0, 10, 8000 // 4)
        entries.append(json.dumps({
            "audio": str(p), "hubert": " ".join(map(str, units))}))
    manifest = tmp_path / "train.txt"
    manifest.write_text("\n".join(entries) + "\n")
    ckpt = tmp_path / "ckpt_da"
    # the 2nd utterance doubles as a validation manifest: the sweep path
    # (make_da_eval + gan_valid_fn, scripts/train.py:362-385) fires every
    # step at --validation-interval 1
    vmanifest = tmp_path / "val.txt"
    vmanifest.write_text(entries[1] + "\n")
    train_da.main(["--config", str(cfgp), "--train-manifest", str(manifest),
                   "--valid-manifest", str(vmanifest),
                   "--validation-interval", "1",
                   "--checkpoint-path", str(ckpt), "--epochs", "1",
                   "--cache-dir", str(tmp_path / "c")])
    names = {p.name for p in ckpt.iterdir()}
    assert any(n.startswith("g_") for n in names), names
    assert any(n.startswith("do_") for n in names), names


def make_ida_cli_stack(tmp_path, rng):
    """Real I_da artifact formats for CLI smoke tests: a torch g_*
    CodeGenerator checkpoint, a local HF HuBERT dir, .npy centroids, a
    config JSON, and a tone wav. Shared by the inpaint-da and
    predict-asr (donor leg) CLIs."""
    import torch
    from transformers import HubertConfig as HFConfig
    from transformers import HubertModel as HFHubert
    from reference_loader import AttrDict, ref_ida_modules, seed_all
    from test_codegen import F0Q, VQ, make_ref_fo_vqvae
    from test_hubert import TINY_BASE

    seed_all()
    _, _, _, model = ref_ida_modules()
    # generator upsample (5*4=20) == HuBERT hop (TINY_BASE strides 5*2*2)
    # == code_hop_size, the IdaInpainter alignment contract
    hifi = dict(resblock="1", upsample_rates=[5, 4],
                upsample_kernel_sizes=[11, 8], upsample_initial_channel=32,
                resblock_kernel_sizes=[3],
                resblock_dilation_sizes=[[1, 3, 5]], model_in_dim=48, num_embeddings=5, embedding_dim=16,
                multispkr="_", f0_stats="yes", f0_normalize=True,
                f0_quantizer_path=None, sampling_rate=16000,
                lambda_commit_code=0, spk_embeddings=4, code_hop_size=20)
    tm = model.CodeGenerator(AttrDict(dict(hifi, f0_quantizer=F0Q))).eval()
    tm.fo_vqvae = make_ref_fo_vqvae()
    tm.emb_p = torch.nn.Embedding(VQ["l_bins"], hifi["embedding_dim"])
    torch.save({"generator": tm.state_dict()}, tmp_path / "g_00000001")

    hub_dir = tmp_path / "hub"
    HFHubert(HFConfig(**TINY_BASE)).save_pretrained(hub_dir)
    km = tmp_path / "km.npy"
    np.save(km, rng.standard_normal(
        (5, TINY_BASE["hidden_size"])).astype(np.float32))

    cfgp = tmp_path / "da.json"
    cfgp.write_text(json.dumps(dict(hifi, f0_quantizer=F0Q)))
    wav = tmp_path / "u0.wav"
    t = np.arange(35200) / 16000.0
    A.save_wav(wav, (0.3 * np.sin(2 * np.pi * 130 * t)).astype(np.float32),
               16000)
    return dict(config=cfgp, checkpoint=tmp_path / "g_00000001",
                hubert=hub_dir, kmeans=km, wav=wav)


def test_inpaint_da_cli(tmp_path, rng):
    """The I_da inpainting driver end-to-end from real artifact formats —
    emits the reference's {name}_gt/_masked_{ms}/_gen/_inpainted_{ms}.wav
    artifact set."""
    from speech_inpainting_tpu.cli import inpaint_da

    stack = make_ida_cli_stack(tmp_path, rng)
    cfgp, km, hub_dir = stack["config"], stack["kmeans"], stack["hubert"]
    manifest = tmp_path / "val.txt"
    manifest.write_text(str(stack["wav"]) + "\n")

    out = tmp_path / "outputs"
    inpaint_da.main([
        "--config", str(cfgp), "--manifest", str(manifest),
        "--codegen-checkpoint", str(tmp_path / "g_00000001"),
        "--hubert", str(hub_dir), "--layer", "2", "--kmeans", str(km),
        "--mask-ms", "100", "200", "--out", str(out)])
    names = {p.name for p in out.iterdir()}
    assert {"u0_gt.wav", "u0_gen.wav", "u0_masked_100.wav",
            "u0_inpainted_100.wav", "u0_masked_200.wav",
            "u0_inpainted_200.wav"} <= names, names


def test_export_aot_cli(tmp_path, rng, monkeypatch):
    """sit-export end-to-end: tiny framework HuBERT checkpoint + torch V1
    g_* + centroids -> self-contained artifact that reloads and runs."""
    import torch
    import jax
    import jax.numpy as jnp
    from reference_loader import AttrDict, ref_hifigan_models, seed_all
    from speech_inpainting_tpu.cli import export_aot
    from speech_inpainting_tpu.models.hubert import (EncoderWithHead,
                                                     HubertConfig)
    from speech_inpainting_tpu.utils.checkpoints import Checkpointer

    tiny = HubertConfig(conv_dim=(8,) * 7, hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=2)
    monkeypatch.setattr(HubertConfig, "base", staticmethod(lambda **o: tiny))
    params = EncoderWithHead(tiny, out_dim=80).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3200)))["params"]
    ck = Checkpointer(tmp_path / "enc")
    ck.save("enc_", 1, {"model": params}, wait=True)

    seed_all()
    tg = ref_hifigan_models().Generator(AttrDict(TINY_V1)).eval()
    torch.save({"generator": tg.state_dict()}, tmp_path / "g_00000001")
    gcfgp = tmp_path / "g.json"
    gcfgp.write_text(json.dumps(TINY_V1))
    km = tmp_path / "km.npy"
    np.save(km, rng.standard_normal((10, 80)).astype(np.float32))

    out = tmp_path / "art"
    export_aot.main([
        "--seconds", "0.2", "--hubert-checkpoint",
        str(tmp_path / "enc" / "enc_00000001"), "--hubert-type", "base",
        "--hifigan-checkpoint", str(tmp_path / "g_00000001"),
        "--hifigan-config", str(gcfgp), "--kmeans", str(km),
        "--out", str(out)])
    names = {p.name for p in out.iterdir()}
    assert {"graph.bin", "params.pkl", "meta.json"} <= names, names

    from speech_inpainting_tpu.infer.aot import load_serving_artifact
    served = load_serving_artifact(str(out))
    got = served.batch(jnp.zeros((2, 4410)), jnp.zeros((2, 3200)),
                       jnp.asarray([1, 2]), jnp.asarray([2, 2]))
    assert np.isfinite(np.asarray(got["inpainted"])).all()

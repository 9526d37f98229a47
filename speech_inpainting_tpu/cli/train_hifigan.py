"""HiFi-GAN training CLI: vanilla vocoder or the centroid-substitution
decoder fine-tune ("modified").

Replaces I_ea/hifi_gan/train.py and train_modified.py. Data parallelism is a
--mesh flag (SPMD over all visible devices) instead of DDP/mp.spawn.

  python -m speech_inpainting_tpu.cli.train_hifigan \
      --wavs DIR [--filelist F] --checkpoint-path ckpt/ \
      [--modified --kmeans model.npy --mask-len 20 --segment-size 44288]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..data.audio import load_wav, peak_normalize
from ..models.hifigan import (Generator, HiFiGANConfig,
                              MultiPeriodDiscriminator,
                              MultiScaleDiscriminator)
from ..quantize.kmeans import KMeans
from ..train.gan import GANConfig, create_gan_state
from ..train.hifigan import (HiFiGANTrainConfig, make_modified_step,
                             make_vanilla_step)
from ..train.run import RunConfig, run_gan_training
from ..ops.mel import MODIFIED_MEL_22K


class CropDataset:
    """Random fixed-length crops of normalized wavs (MelDataset's audio
    handling: /32768 + inf-norm ×0.95 + random segment,
    meldataset.py:113-141). Short utterances are zero-padded.

    `mels_dir` enables the teacher-mel fine-tuning regime
    (meldataset.py:137-168, driven by train.py --fine_tuning): the
    generator input is `<mels_dir>/<stem>.npy` (e.g. Tacotron output mels)
    instead of the in-graph mel of the audio, audio is NOT inf-norm
    normalized (meldataset.py:123), and crops are mel-aligned — a random
    teacher-frame window with the matching [start*hop, start*hop+seg)
    audio slice (the mel-L1 target stays the true audio's mel, computed
    in-graph by make_vanilla_step)."""

    def __init__(self, paths, segment_size: int, sr: int = 22050,
                 normalize: bool = True, mels_dir=None, hop: int = 256):
        self.segment_size = segment_size
        self.hop = hop
        self.wavs, self.mels = [], []
        for p in paths:
            wav, _ = load_wav(p, target_sr=sr)
            if normalize:
                wav = peak_normalize(wav, 0.95)
            self.wavs.append(wav.astype(np.float32))
            if mels_dir is not None:
                mel = np.load(Path(mels_dir) / f"{Path(p).stem}.npy")
                if mel.ndim == 3:          # (1, 80, F) dumps
                    mel = mel[0]
                self.mels.append(mel.astype(np.float32))
        if self.mels:
            assert segment_size % hop == 0, (
                "teacher-mel crops are hop-aligned; segment_size must be a "
                f"multiple of hop {hop}")

    def _teacher_crop(self, rng, w, mel, seg):
        """Mel-aligned random crop (meldataset.py:159-168). Mirrors the
        reference's start range [0, F-fps-1] and constant-pad of short
        utterances (both mel and audio)."""
        fps = seg // self.hop
        if len(w) >= seg and mel.shape[1] > fps:
            a = int(rng.integers(0, mel.shape[1] - fps))
            return (w[a * self.hop:a * self.hop + seg],
                    mel[:, a:a + fps])
        return (np.pad(w[:seg], (0, max(0, seg - len(w)))),
                np.pad(mel[:, :fps], ((0, 0), (0, max(0, fps - mel.shape[1])))))

    def batches(self, batch_size: int, *, epoch: int, seed: int = 1234,
                n441_mask_limit: int = 0):
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        order = rng.permutation(len(self.wavs))
        seg = self.segment_size
        for s in range(0, len(order) - batch_size + 1, batch_size):
            crops, mels, starts = [], [], []
            for i in order[s:s + batch_size]:
                w = self.wavs[i]
                if self.mels:
                    crop, mel = self._teacher_crop(rng, w, self.mels[i], seg)
                    crops.append(crop)
                    mels.append(mel)
                elif len(w) >= seg:
                    a = int(rng.integers(0, len(w) - seg + 1))
                    crops.append(w[a:a + seg])
                else:
                    crops.append(np.pad(w, (0, seg - len(w))))
                if n441_mask_limit > 0:
                    starts.append(int(rng.integers(0, n441_mask_limit)))
            batch = {"audio": np.stack(crops)[:, None, :]}
            if mels:
                batch["mel"] = np.stack(mels)
            if starts:
                batch["mask_start"] = np.asarray(starts, np.int32)
            yield batch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wavs", required=True)
    p.add_argument("--filelist", default=None)
    p.add_argument("--valid-filelist", default=None,
                   help="held-out filelist for the periodic validation "
                        "mel-error sweep (train.py:218-246); deterministic "
                        "crops, logged as validation/mel_error")
    p.add_argument("--config", default=None, help="hifi-gan json config")
    p.add_argument("--checkpoint-path", required=True)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--segment-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--modified", action="store_true")
    p.add_argument("--fine-tuning", action="store_true",
                   help="teacher-mel fine-tune (train.py --fine_tuning): "
                        "generator input mels come from --input-mels-dir "
                        "instead of the audio; audio not inf-norm normalized")
    p.add_argument("--input-mels-dir", default=None,
                   help="dir of <stem>.npy teacher mels (base_mels_path)")
    p.add_argument("--istft", action="store_true",
                   help="iSTFT-head fast vocoder (models/hifigan_istft.py):"
                        " 1.65x serving / 3x training vs V1, same recipe")
    p.add_argument("--kmeans", default=None)
    p.add_argument("--mask-len", type=int, default=20)
    p.add_argument("--warm-start", default=None,
                   help="torch g_* checkpoint (e.g. UNIVERSAL_V1) to import")
    p.add_argument("--skip-nonfinite", type=int, default=0,
                   metavar="N",
                   help="never apply nan/inf-grad updates; abort (after "
                        "checkpointing) past N consecutive skips")
    p.add_argument("--bf16-disc", action="store_true",
                   help="discriminators compute in bf16 (params/losses f32;"
                        " +20%% steps/s, BENCH_TRAIN_r03.json)")
    p.add_argument("--mesh", action="store_true",
                   help="shard batches over all devices (SPMD data parallel)")
    p.add_argument("--validation-interval", type=int, default=1000,
                   help="steps between validation sweeps "
                        "(train.py --validation_interval)")
    p.add_argument("--seed", type=int, default=1234)
    from ..parallel.distributed import add_cli_args, initialize_from_args
    add_cli_args(p)
    args = p.parse_args(argv)
    # multi-host: join the process group BEFORE any jax dispatch; jitted
    # steps then span every host's devices (replacing mp.spawn + DDP,
    # I_ea/hifi_gan/train.py:296-299)
    if initialize_from_args(args):
        args.mesh = True

    h = json.loads(Path(args.config).read_text()) if args.config else {}
    gcfg = HiFiGANConfig.from_dict(h) if h else HiFiGANConfig()
    seg = args.segment_size or h.get("segment_size",
                                     44288 if args.modified else 8192)
    tcfg = HiFiGANTrainConfig(
        gan=GANConfig(learning_rate=h.get("learning_rate", 2e-4),
                      adam_b1=h.get("adam_b1", 0.8),
                      adam_b2=h.get("adam_b2", 0.99),
                      lr_decay=h.get("lr_decay", 0.999),
                      # bit-identical to the two-call layout
                      # (BENCH_TRAIN_r03.json)
                      batched_disc=True, disc_bf16=args.bf16_disc,
                      skip_nonfinite=args.skip_nonfinite),
        hifigan=gcfg, segment_size=seg, mask_len=args.mask_len)

    def filelist_paths(filelist):
        names = [l.strip().split("|")[0] for l in
                 Path(filelist).read_text().splitlines() if l.strip()]
        return [Path(args.wavs) / f"{n}.wav" for n in names]

    if args.filelist:
        paths = filelist_paths(args.filelist)
    else:
        paths = sorted(Path(args.wavs).glob("*.wav"))
    if args.fine_tuning:
        assert not args.modified, ("--fine-tuning is the teacher-mel vanilla "
                                   "recipe; --modified quantizes in-graph")
        assert args.input_mels_dir, "--fine-tuning requires --input-mels-dir"
        ds = CropDataset(paths, seg, normalize=False,
                         mels_dir=args.input_mels_dir,
                         hop=tcfg.mel_input.hop_size)
    else:
        ds = CropDataset(paths, seg)

    generator = None
    if args.istft:
        assert not args.modified, "--istft is a vanilla-recipe family"
        from ..models.hifigan_istft import (ISTFTGenerator,
                                            ISTFTGeneratorConfig)
        icfg = ISTFTGeneratorConfig(
            upsample_initial_channel=gcfg.upsample_initial_channel,
            resblock_kernel_sizes=gcfg.resblock_kernel_sizes,
            resblock_dilation_sizes=gcfg.resblock_dilation_sizes,
            in_dim=gcfg.in_dim, sampling_rate=gcfg.sampling_rate,
            dtype=gcfg.dtype)
        assert icfg.total_upsample == gcfg.total_upsample, (
            "iSTFT geometry must keep the mel hop")
        generator = ISTFTGenerator(icfg)

    if args.modified:
        assert args.kmeans, "--modified requires --kmeans"
        km = KMeans.load_auto(args.kmeans)
        step = make_modified_step(tcfg, km.centroids)
        n441 = max(1, MODIFIED_MEL_22K.num_frames(seg) - args.mask_len)
    else:
        step = make_vanilla_step(tcfg, generator=generator)
        n441 = 0

    rng = jax.random.PRNGKey(args.seed)
    gen = generator or Generator(gcfg)
    n_in = tcfg.mel_input.num_frames(seg)
    gp = gen.init(rng, jnp.zeros((1, gcfg.in_dim, n_in)))["params"]
    if args.warm_start:
        assert not args.istft, ("--warm-start loads V1-architecture torch "
                                "checkpoints; the iSTFT family trains fresh")
        from ..convert.hifigan_torch import load_generator_checkpoint
        gp = load_generator_checkpoint(args.warm_start, gcfg)
        print(f"warm-started generator from {args.warm_start}")
    x = jnp.zeros((1, 1, seg))
    mpd = MultiPeriodDiscriminator().init(jax.random.PRNGKey(1), x, x)["params"]
    msdv = MultiScaleDiscriminator().init(
        {"params": jax.random.PRNGKey(2)}, x, x, True)
    state = create_gan_state(tcfg.gan, gp, mpd, msdv["params"],
                             msdv["spectral"])

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh()
        print(f"data-parallel over {mesh.devices.size} devices")
    run = RunConfig(epochs=args.epochs, checkpoint_dir=args.checkpoint_path,
                    log_dir=args.log_dir, mesh=mesh,
                    abort_nonfinite=args.skip_nonfinite,
                    validation_interval=args.validation_interval)
    valid_fn = None
    if args.valid_filelist:
        from ..train.hifigan import (make_modified_eval, make_vanilla_eval,
                                     modified_gen_fwd, vanilla_gen_fwd)
        from ..train.run import gan_valid_fn
        vds = CropDataset(
            filelist_paths(args.valid_filelist), seg,
            normalize=not args.fine_tuning,
            mels_dir=args.input_mels_dir if args.fine_tuning else None,
            hop=tcfg.mel_input.hop_size)
        # deterministic sweep: fixed epoch/seed → the same crops every visit
        val_batches = list(vds.batches(
            min(args.batch_size, len(vds.wavs)), epoch=0,
            seed=args.seed + 1, n441_mask_limit=n441))
        if args.modified:
            ev = make_modified_eval(tcfg, km.centroids)
            fwd = modified_gen_fwd(tcfg, km.centroids)
        else:
            ev = make_vanilla_eval(tcfg, generator=generator)
            fwd = vanilla_gen_fwd(tcfg, generator)
        valid_fn = gan_valid_fn(ev, val_batches, mesh, media_fwd=fwd,
                                media_mel=tcfg.mel_input,
                                sample_rate=gcfg.sampling_rate)
    run_gan_training(step, state,
                     lambda epoch: ds.batches(args.batch_size, epoch=epoch,
                                              seed=args.seed,
                                              n441_mask_limit=n441),
                     run, valid_fn=valid_fn)


if __name__ == "__main__":
    main()

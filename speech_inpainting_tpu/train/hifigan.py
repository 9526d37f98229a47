"""HiFi-GAN training variants: vanilla vocoder training and the
centroid-substitution decoder fine-tune ("modified" trainer).

Behavior matched (code new):
  - vanilla: generator input = mel(hop 256, fmax 8000) of the audio crop,
    loss mel = full-band (I_ea/hifi_gan/train.py:148-186,
    meldataset.py:49-175). Teacher-mel fine-tuning passes batch['mel'].
  - modified fine-tune (train_modified.py:35-261 + meldataset_modified.py:
    121-197): a hop-441 mel of the crop has a random `mask_len`-frame span
    (or all frames, mask_len=-1) replaced by its nearest k-means centroids,
    then is bilinearly regridded onto the hop-256 frame grid as generator
    input.

TPU redesign: the reference does mel/quantize/regrid per item in DataLoader
workers; here the whole pre-stage lives INSIDE the jitted GAN step (it is a
few GEMMs), so the host pipeline ships only raw audio crops + mask starts.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.hifigan import Generator, HiFiGANConfig
from ..ops.masking import frame_mask
from ..ops.mel import (MODIFIED_MEL_22K, VOCODER_MEL_22K,
                       VOCODER_MEL_22K_FULLBAND, MelConfig, mel_spectrogram)
from ..ops.resize import regrid_mel_to
from ..quantize.kmeans import quantize_to_centroids
from .gan import GANConfig, create_gan_state, make_gan_eval, make_gan_step


@dataclasses.dataclass(frozen=True)
class HiFiGANTrainConfig:
    gan: GANConfig = GANConfig()
    hifigan: HiFiGANConfig = HiFiGANConfig()
    segment_size: int = 8192          # 44288 for the modified fine-tune
    mask_len: int = 20                # frames; -1 → quantize all frames
    mel_input: MelConfig = VOCODER_MEL_22K
    mel_441: MelConfig = MODIFIED_MEL_22K
    mel_loss: MelConfig = VOCODER_MEL_22K_FULLBAND


def vanilla_gen_fwd(cfg: HiFiGANTrainConfig, generator=None):
    """gen_fwd(g_params, batch) for the vanilla recipe: generator input =
    in-graph mel of the crop, or the teacher 'mel' when present."""
    gen = generator or Generator(cfg.hifigan)

    def gen_fwd(g_params, batch):
        mel = batch["mel"] if "mel" in batch else mel_spectrogram(
            batch["audio"][:, 0], cfg.mel_input)
        return gen.apply({"params": g_params}, mel)

    return gen_fwd


def modified_gen_fwd(cfg: HiFiGANTrainConfig, centroids, generator=None):
    """gen_fwd(g_params, batch) for the centroid-substitution recipe:
    hop-441 mel → nearest-centroid span replacement → hop-256 regrid."""
    gen = generator or Generator(cfg.hifigan)
    C = jnp.asarray(centroids, jnp.float32)          # (K, 80)

    def gen_fwd(g_params, batch):
        audio = batch["audio"][:, 0]
        comp_mel = mel_spectrogram(audio, cfg.mel_441)       # (B, 80, F441)
        f441 = comp_mel.shape[-1]
        q = quantize_to_centroids(jnp.swapaxes(comp_mel, 1, 2), C)  # (B,F,80)
        if cfg.mask_len < 0:
            comp_mel = jnp.swapaxes(q, 1, 2)
        else:
            m = jax.vmap(frame_mask, in_axes=(None, 0, None))(
                f441, batch["mask_start"], cfg.mask_len)     # (B, F441)
            comp_mel = jnp.where(m[:, None, :], jnp.swapaxes(q, 1, 2),
                                 comp_mel)
        n256 = cfg.mel_input.num_frames(audio.shape[-1])
        ext_mel = regrid_mel_to(comp_mel, n256)
        return gen.apply({"params": g_params}, ext_mel)

    return gen_fwd


def make_vanilla_step(cfg: HiFiGANTrainConfig, *, generator=None,
                      mpd=None, msd=None):
    """Vanilla HiFi-GAN: batch = {'audio': (B,1,S)} (+ optional teacher
    'mel'); returns the jittable GAN step. `generator` overrides the module
    (e.g. models.hifigan_istft.ISTFTGenerator — same recipe, faster head);
    mpd/msd as in make_gan_step."""
    return make_gan_step(vanilla_gen_fwd(cfg, generator),
                         lambda w: mel_spectrogram(w, cfg.mel_loss), cfg.gan,
                         mpd=mpd, msd=msd)


def make_modified_step(cfg: HiFiGANTrainConfig, centroids, *,
                       generator=None, mpd=None, msd=None):
    """Centroid-substitution fine-tune: batch = {'audio': (B,1,S),
    'mask_start': (B,) int32 — random span start in hop-441 frames}.
    `generator`/`mpd`/`msd` override the modules as in make_vanilla_step
    (the iSTFT-head family trains on this recipe too — same mel frontend,
    same GAN losses, faster waveform head)."""
    return make_gan_step(modified_gen_fwd(cfg, centroids, generator),
                         lambda w: mel_spectrogram(w, cfg.mel_loss), cfg.gan,
                         mpd=mpd, msd=msd)


def make_vanilla_eval(cfg: HiFiGANTrainConfig, *, generator=None):
    """Validation mel error (reference train.py:218-246) for the vanilla
    recipe; eval_fn(g_params, batch) → {'mel_error'}."""
    return make_gan_eval(vanilla_gen_fwd(cfg, generator),
                         lambda w: mel_spectrogram(w, cfg.mel_loss))


def make_modified_eval(cfg: HiFiGANTrainConfig, centroids, *,
                       generator=None):
    """Validation mel error for the centroid-substitution recipe
    (train_modified.py:218-252's sweep, minus the soundfile wav dumps —
    TB audio goes through utils/logging.py instead)."""
    return make_gan_eval(modified_gen_fwd(cfg, centroids, generator),
                         lambda w: mel_spectrogram(w, cfg.mel_loss))


__all__ = ["HiFiGANTrainConfig", "GANConfig", "create_gan_state",
           "make_vanilla_step", "make_modified_step",
           "make_vanilla_eval", "make_modified_eval",
           "vanilla_gen_fwd", "modified_gen_fwd"]

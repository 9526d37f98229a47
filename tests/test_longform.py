"""Long-form windowed inpainting: window planning, paste math, E2E parity
with the direct window graph, single-compile reuse, edge masks."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from speech_inpainting_tpu.infer.longform import (  # noqa: E402
    LongFormConfig, LongFormInpainter, plan_windows, _crossfade_paste,
    S22, S16)
from tests.test_inpaint import tiny_inpainter  # noqa: E402


# --- plan_windows ----------------------------------------------------------

def test_plan_windows_centers_and_clamps():
    ws, rel = plan_windows(1000, [500], [10], 100, margin=2)
    assert ws[0] == 500 + 5 - 50
    assert rel[0] == 500 - ws[0]
    # start edge: window pinned at 0
    ws, rel = plan_windows(1000, [0, 3], [10, 10], 100, margin=2)
    assert list(ws) == [0, 0] and list(rel) == [0, 3]
    # end edge: the caller pads the tail by `margin` frames before planning
    # (LongFormInpainter.__call__), so a mask ending at the recording edge
    # still sits >= margin frames from the window end
    ws, rel = plan_windows(1000 + 2, [995], [5], 100, margin=2)
    assert ws[0] + 100 <= 1000 + 2 and rel[0] + 5 <= 100 - 2
    assert rel[0] == 995 - ws[0]


def test_plan_windows_validation():
    with pytest.raises(ValueError):
        plan_windows(1000, [0], [97], 100, margin=2)   # exceeds capacity
    with pytest.raises(ValueError):
        plan_windows(1000, [998], [5], 100, margin=2)  # runs past the end
    with pytest.raises(ValueError):
        plan_windows(1000, [5], [0], 100, margin=2)    # empty mask


def test_crossfade_paste_interior_exact_and_bounds():
    y = np.zeros(1000, np.float32)
    patch = np.ones(300, np.float64)
    _crossfade_paste(y, patch, 100, fade=20)
    # interior is the patch exactly, fades are monotone ramps
    np.testing.assert_allclose(y[120:380], 1.0)
    assert 0 < y[105] < 1 and 0 < y[395] < 1
    assert np.all(y[:100] == 0) and np.all(y[400:] == 0)
    # clamped paste at the start does not crash or write out of bounds
    y2 = np.zeros(50, np.float32)
    _crossfade_paste(y2, np.ones(100, np.float64), -30, fade=10)
    assert y2.shape == (50,) and np.isfinite(y2).all()


# --- end-to-end ------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    rng = np.random.default_rng(3)
    _, inp, _ = tiny_inpainter(rng)
    return inp


def _long_wavs(rng, frames):
    t = np.arange(frames * S22) / 22050.0
    w22 = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(frames * S22)).astype(np.float32)
    t16 = np.arange(frames * S16) / 16000.0
    w16 = (0.3 * np.sin(2 * np.pi * 220 * t16)
           + 0.05 * rng.standard_normal(frames * S16)).astype(np.float32)
    return w22, w16


def test_longform_untouched_outside_patches_and_single_compile(tiny):
    rng = np.random.default_rng(0)
    total = 96                        # ~1.9 s at 20 ms frames
    w22, w16 = _long_wavs(rng, total)
    cfg = LongFormConfig(window_frames=32, batch=2, depth=2, margin_frames=2)
    lf = LongFormInpainter(tiny, cfg)
    mask_pos = np.array([0, 40, 91])  # start edge, interior, end edge
    mask_len = np.array([4, 6, 5])
    out, spans = lf(w22, w16, mask_pos, mask_len)
    assert out.shape == w22.shape and len(spans) == 3
    untouched = np.ones(len(out), bool)
    for a, b in spans:
        assert 0 <= a < b <= len(out)
        untouched[a:b] = False
    np.testing.assert_array_equal(out[untouched], w22[untouched])
    assert not np.array_equal(out[~untouched], w22[~untouched])
    assert np.isfinite(out).all()
    # one compile for all windows/batches (static window shape)
    assert tiny._graph._cache_size() == 1


def test_longform_matches_direct_window_graph(tiny):
    """Interior of a pasted mask == the direct InformedInpainter output on
    the same window, rescaled by the inverse peak-normalization gain."""
    rng = np.random.default_rng(1)
    total = 96
    w22, w16 = _long_wavs(rng, total)
    cfg = LongFormConfig(window_frames=32, batch=1, depth=1, margin_frames=2)
    pos, ln = 48, 6
    out, spans = LongFormInpainter(tiny, cfg)(
        w22, w16, np.array([pos]), np.array([ln]))
    ws, rel = plan_windows(total, [pos], [ln], 32, 2)
    ws, rel = int(ws[0]), int(rel[0])
    win22 = w22[ws * S22:(ws + 32) * S22]
    win16 = w16[ws * S16:(ws + 32) * S16]
    masked = win22.copy()
    masked[rel * S22:(rel + ln) * S22] = 0.0
    gain = max(float(np.abs(masked).max()), 1e-10) / 0.95
    direct = np.asarray(tiny.batch(win22[None], win16[None],
                                   np.array([rel], np.int32),
                                   np.array([ln], np.int32))["inpainted"][0])
    fade = int(cfg.crossfade_s * 22050)
    a = (pos) * S22 + fade           # inside the fades
    b = (pos + ln) * S22 - fade
    da = (rel) * S22 + fade
    np.testing.assert_allclose(out[a:b], direct[da:da + (b - a)] * gain,
                               rtol=2e-5, atol=2e-6)


def test_longform_short_recording_and_scale_restore(tiny):
    """A recording shorter than one window is padded, output keeps length;
    the pasted patch is restored to the recording's native level (an input
    at 0.01 peak must not come back at the normalized 0.95 level)."""
    rng = np.random.default_rng(2)
    w22, w16 = _long_wavs(rng, 20)
    w22, w16 = w22 * 0.03, w16 * 0.03
    cfg = LongFormConfig(window_frames=32, batch=2, depth=2, margin_frames=2)
    out, spans = LongFormInpainter(tiny, cfg)(w22, w16,
                                              np.array([8]), np.array([4]))
    assert out.shape == w22.shape
    a, b = spans[0]
    assert np.abs(out[a:b]).max() < 10 * np.abs(w22).max()


def test_merge_mask_spans():
    from speech_inpainting_tpu.infer.longform import merge_mask_spans
    # adjacent and near-adjacent (gap <= 2) coalesce; distant stay apart
    pos, ln = merge_mask_spans([100, 104, 120], [4, 4, 5])
    assert pos.tolist() == [100, 120] and ln.tolist() == [8, 5]
    # unsorted input, containment, exact-gap boundary
    pos, ln = merge_mask_spans([50, 10, 12], [5, 10, 3])
    assert pos.tolist() == [10, 50] and ln.tolist() == [10, 5]
    pos, ln = merge_mask_spans([10, 23], [10, 2])   # gap 3 > 2: no merge
    assert pos.tolist() == [10, 23]
    pos, ln = merge_mask_spans([10, 22], [10, 2])   # gap 2: merges
    assert pos.tolist() == [10] and ln.tolist() == [14]
    p, l = merge_mask_spans([7], [3])
    assert p.tolist() == [7] and l.tolist() == [3]


def test_longform_multimask_window_context_zeroed(tiny):
    """Two masks far enough apart not to merge but close enough to share a
    window: each window must see the OTHER mask's span zeroed (it is
    corrupt audio, not clean context), and both spans must end up
    inpainted — neither patch overwrites the other with resynthesized
    corruption. Guarded indirectly: output inside both spans differs from
    the corrupt original, and outside both patches it is untouched."""
    rng = np.random.default_rng(5)
    total = 96
    w22, w16 = _long_wavs(rng, total)
    # corrupt the two mask spans with loud noise so 'copied-through
    # corruption' is detectable
    for q, n in ((40, 4), (50, 4)):
        w22[q * S22:(q + n) * S22] = rng.standard_normal(n * S22) * 0.9
        w16[q * S16:(q + n) * S16] = rng.standard_normal(n * S16) * 0.9
    cfg = LongFormConfig(window_frames=32, batch=2, depth=2, margin_frames=2)
    out, spans = LongFormInpainter(tiny, cfg)(
        w22, w16, np.array([40, 50]), np.array([4, 4]))
    assert len(spans) == 2
    for q, n in ((40, 4), (50, 4)):
        a, b = (q + 1) * S22, (q + n - 1) * S22   # interior, past any fade
        seg_out, seg_in = out[a:b], w22[a:b]
        # the corrupt original must NOT survive inside the mask
        assert np.abs(seg_out - seg_in).max() > 1e-3
        # and the inpainted level is sane (not the 0.9-RMS noise burst)
        assert np.sqrt((seg_out**2).mean()) < np.sqrt((seg_in**2).mean())
    untouched = np.ones(len(out), bool)
    for a, b in spans:
        untouched[a:b] = False
    np.testing.assert_array_equal(out[untouched], w22[untouched])


def test_crossfade_paste_asymmetric_fades():
    y = np.zeros(1000, np.float32)
    _crossfade_paste(y, np.ones(300, np.float64), 0, fade=20, fade_in=False)
    np.testing.assert_allclose(y[:280], 1.0)      # no fade-in ramp
    assert 0 < y[295] < 1                          # fade-out still present
    y2 = np.zeros(1000, np.float32)
    _crossfade_paste(y2, np.ones(300, np.float64), 700, fade=20,
                     fade_out=False)
    assert 0 < y2[705] < 1
    np.testing.assert_allclose(y2[720:1000], 1.0)  # no fade-out ramp

"""Dataset acquisition tests (data/download.py): archive extraction with the
reference's nested-zip layout, HTTP download against a localhost server (no
egress in this sandbox), and the VCTK flac→wav conversion flow end-to-end
through the native FLAC decoder."""
import io
import tarfile
import threading
import zipfile
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import numpy as np

from flac_fixture import encode as flac_encode
from speech_inpainting_tpu.data.audio import load_wav
from speech_inpainting_tpu.data.download import (DATASETS, download, extract,
                                                 fetch_dataset, vctk_to_wavs)


def _tone(n=4800, sr=48000):
    t = np.arange(n)
    return (8000 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.int64)


def _make_vctk_zip(path):
    """VCTK-0.92-style archive: a zip whose payload sits in a nested zip
    (preprocessing.py:46-54 handles exactly one nesting level)."""
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        for spk in ("p225", "p226"):
            for txt in ("001", "002"):
                z.writestr(
                    f"wav48_silence_trimmed/{spk}/{spk}_{txt}_mic1.flac",
                    flac_encode([_tone()], sr=48000, modes=["fixed2"]))
                z.writestr(
                    f"wav48_silence_trimmed/{spk}/{spk}_{txt}_mic2.flac",
                    flac_encode([_tone()], sr=48000))
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("VCTK-0.92/inner.zip", inner.getvalue())
        z.writestr("VCTK-0.92/readme.txt", "fixture")


def test_extract_tar_bz2(tmp_path):
    payload = tmp_path / "LJ.tar.bz2"
    src = tmp_path / "stage" / "LJSpeech-1.1" / "wavs"
    src.mkdir(parents=True)
    (src / "LJ001-0001.wav").write_bytes(b"RIFFxxxx")
    with tarfile.open(payload, "w:bz2") as t:
        t.add(tmp_path / "stage" / "LJSpeech-1.1", arcname="LJSpeech-1.1")
    dest = extract(payload, tmp_path / "LJSpeech-1.1")
    assert (dest / "wavs" / "LJ001-0001.wav").exists()
    # idempotent: second call is a no-op
    assert extract(payload, dest) == dest


def test_extract_zip_with_nested_zips(tmp_path):
    archive = tmp_path / "VCTK-0.92.zip"
    _make_vctk_zip(archive)
    dest = extract(archive, tmp_path / "VCTK-0.92")
    flacs = sorted(dest.rglob("*_mic1.flac"))
    assert len(flacs) == 4, [p.name for p in dest.rglob("*")]


def test_download_localhost_and_skip(tmp_path):
    (tmp_path / "srv").mkdir()
    (tmp_path / "srv" / "a.bin").write_bytes(b"\x01\x02" * 1000)
    handler = partial(SimpleHTTPRequestHandler,
                      directory=str(tmp_path / "srv"))
    httpd = HTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        out = download(f"http://127.0.0.1:{port}/a.bin", tmp_path / "a.bin",
                       progress=False)
        assert out.read_bytes() == b"\x01\x02" * 1000
        # existing file short-circuits (offline-staged archive path)
        out.write_bytes(b"staged")
        download("http://127.0.0.1:1/unreachable", out, progress=False)
        assert out.read_bytes() == b"staged"
    finally:
        httpd.shutdown()


def test_download_failure_message(tmp_path):
    import pytest
    with pytest.raises(RuntimeError, match="egress"):
        download("http://127.0.0.1:1/nope", tmp_path / "nope.bin",
                 progress=False)
    assert not (tmp_path / "nope.bin").exists()


def test_vctk_fetch_flow(tmp_path):
    """The full preprocessing.py __main__ flow from a staged archive:
    extract + mic1-only flac decode + resample to 22.05 kHz wavs named
    <speaker>_<textnum>.wav."""
    _make_vctk_zip(tmp_path / DATASETS["VCTK"]["out_file"])
    dest = fetch_dataset("VCTK", tmp_path, skip_download=True)
    wavs = sorted((dest / "wavs").glob("*.wav"))
    assert [w.name for w in wavs] == ["p225_001.wav", "p225_002.wav",
                                      "p226_001.wav", "p226_002.wav"]
    audio, sr = load_wav(wavs[0])
    assert sr == 22050
    assert abs(len(audio) - 4800 * 22050 / 48000) <= 1
    # the 220 Hz tone survives decode+resample
    spec = np.abs(np.fft.rfft(audio))
    peak_hz = np.argmax(spec) * sr / len(audio)
    assert abs(peak_hz - 220) < 5


def test_vctk_to_wavs_skips_existing(tmp_path, capsys):
    (tmp_path / "wavs").mkdir()
    assert vctk_to_wavs(tmp_path, tmp_path / "wavs") == 0

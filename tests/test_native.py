"""Native C++ host runtime parity vs the pure-Python implementations."""

import numpy as np
import pytest

from kofft_tpu import native
from kofft_tpu.utils.audio import write_wav
from kofft_tpu.utils.image import encode_png

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_png_parity_8bit(rng):
    img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    assert native.png_encode(img) == encode_png(img)


def test_png_parity_16bit(rng):
    img = (rng.random((8, 5, 3)) * 65535).astype(np.uint16)
    assert native.png_encode(img) == encode_png(img)


def test_wav_decode_parity(tmp_path, rng):
    p = tmp_path / "x.wav"
    x = rng.uniform(-0.9, 0.9, 441).astype(np.float32)
    write_wav(p, x, 22050)
    out = native.wav_decode_i16(p.read_bytes())
    assert out is not None
    samples, sr, ch = out
    assert sr == 22050 and ch == 1
    from kofft_tpu.utils.audio import read_wav
    ref, _ = read_wav(p)
    np.testing.assert_allclose(samples, ref, atol=1e-7)


def test_wav_decode_rejects_garbage():
    assert native.wav_decode_i16(b"not a wav file at all") is None


def test_native_ola_matches_istft_stream(rng):
    """C++ OLA == IstftStream normalization/push/flush semantics."""
    from kofft_tpu.ops import stft as S, window as W
    win, hop, n = 64, 16, 512
    x = rng.standard_normal(n).astype(np.float32)
    w = W.hann(win)
    frames = np.asarray(S.stft(x, w, hop))
    nf = frames.shape[0]
    # python reference stream
    st = S.IstftStream(win, hop, w)
    py = np.concatenate([st.push_frame(frames[i]) for i in range(nf)]
                        + [st.flush()])
    # native OLA gets the *time-domain* inverse frames (pre-window)
    ola = native.NativeOla(win, hop, w)
    td = np.fft.ifft(frames, axis=-1).real.astype(np.float32)
    nat = np.concatenate([ola.push(td[i]) for i in range(nf)]
                         + [ola.flush()])
    np.testing.assert_allclose(nat, py, rtol=1e-4, atol=1e-5)


def test_wav_decode_truncated_fmt_chunk_safe():
    """A fmt header whose body is cut off must be rejected, not read past
    the buffer (the chunk loop only checked the 8-byte header fit)."""
    import struct
    from kofft_tpu import native
    if not native.available():
        return
    bad = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + b"\x01\x00")
    assert native.wav_decode_i16(bad) is None


def test_build_force_and_load_cached():
    """build(force=True) recompiles from source; a second _load() hit
    returns the cached handle without re-entering the build."""
    from kofft_tpu import native
    assert native.build(force=True)
    lib1 = native._load()
    lib2 = native._load()
    assert lib1 is lib2


def test_png_encode_rejects_bad_shapes_and_dtypes(rng):
    from kofft_tpu.native import png_encode
    assert png_encode(rng.random((8, 8)).astype(np.float32)) is None
    assert png_encode(
        rng.random((8, 8, 3)).astype(np.float32)) is None  # float dtype
    assert png_encode(
        (rng.random((8, 8, 4)) * 255).astype(np.uint8)) is None  # RGBA


def test_native_ola_error_paths():
    from kofft_tpu.native import NativeOla
    import numpy as np
    w = np.hanning(16).astype(np.float32)
    with pytest.raises(ValueError):
        NativeOla(16, 4, window=np.ones(8, np.float32))  # wrong win len
    with pytest.raises(ValueError):
        NativeOla(16, 0, window=w)                       # invalid hop
    ola = NativeOla(16, 4, window=w)
    with pytest.raises(ValueError):
        ola.push(np.ones(8, np.float32))                 # wrong frame len

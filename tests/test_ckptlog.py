"""Native checkpoint record-log round trip (C++ + Python fallback)."""

import numpy as np
import pytest

from marl_hideandseek_tpu.utils.ckptlog import (
    CkptLogReader,
    CkptLogWriter,
    _lib,
)


def _roundtrip(tmp_path, monkeypatch=None):
    path = str(tmp_path / "log.bin")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (4, 64), dtype=np.uint8)
              for _ in range(5)]
    with CkptLogWriter(path, 4, 64) as w:
        for fr in frames:
            w.append(fr)
    with CkptLogReader(path) as r:
        assert r.num_frames == 5
        assert r.num_worlds == 4
        assert r.frame_bytes == 64
        for i, fr in enumerate(frames):
            np.testing.assert_array_equal(r.read(i), fr)
        # Random access out of order.
        np.testing.assert_array_equal(r.read(3), frames[3])
        np.testing.assert_array_equal(r.read(0), frames[0])


def test_roundtrip(tmp_path):
    _roundtrip(tmp_path)


def test_native_lib_builds():
    """The C++ library should build on this toolchain."""
    assert _lib() is not None


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "log.bin")
    with CkptLogWriter(path, 2, 32) as w:
        w.append(np.zeros((2, 32), np.uint8))
    # Flip a payload byte.
    with open(path, "r+b") as f:
        f.seek(-1, 2)
        f.write(b"\xff")
    with CkptLogReader(path) as r:
        with pytest.raises(IOError):
            r.read(0)

"""Native mmap tile-IO engine + disk-resident GEMM."""

import numpy as np
import pytest

from gemm_hls_tpu.parallel import streamed_matmul_files
from gemm_hls_tpu.utils.tileio import MatrixFile, native_tileio_available
from gemm_hls_tpu.utils import make_operands, reference_matmul, verify_matmul


def test_native_lib_builds():
    assert native_tileio_available()


def test_roundtrip_tiles(tmp_path):
    data = np.arange(48 * 32, dtype=np.float32).reshape(48, 32)
    p = tmp_path / "m.bin"
    with MatrixFile(p, 48, 32, np.float32, create=True) as mf:
        mf.write_tile(0, 0, data)
    with MatrixFile(p, 48, 32, np.float32) as mf:
        np.testing.assert_array_equal(mf.read_tile(0, 48, 0, 32), data)
        np.testing.assert_array_equal(mf.read_tile(10, 20, 5, 17),
                                      data[10:20, 5:17])


def test_write_subtiles(tmp_path):
    p = tmp_path / "m.bin"
    exp = np.zeros((16, 16), np.float32)
    with MatrixFile(p, 16, 16, np.float32, create=True) as mf:
        mf.write_tile(0, 0, exp)
        blk = np.full((4, 8), 7.0, np.float32)
        mf.write_tile(4, 8, blk)
        exp[4:8, 8:16] = 7.0
    with MatrixFile(p, 16, 16, np.float32) as mf:
        np.testing.assert_array_equal(mf.read_tile(0, 16, 0, 16), exp)


def test_out_of_bounds_rejected(tmp_path):
    p = tmp_path / "m.bin"
    with MatrixFile(p, 8, 8, np.float32, create=True) as mf:
        if native_tileio_available():
            with pytest.raises(ValueError, match="tileio_read_tile"):
                mf.read_tile(0, 9, 0, 8)


def test_disk_resident_gemm(tmp_path):
    a, b = make_operands(96, 80, 112, "float32")
    exp = reference_matmul(a, b)
    with MatrixFile(tmp_path / "a.bin", 96, 112, np.float32, create=True) as fa, \
         MatrixFile(tmp_path / "b.bin", 112, 80, np.float32, create=True) as fb, \
         MatrixFile(tmp_path / "c.bin", 96, 80, np.float32, create=True) as fc:
        fa.write_tile(0, 0, a)
        fb.write_tile(0, 0, b)
        streamed_matmul_files(fa, fb, fc, tile_m=32, tile_n=48, tile_k=64)
        verify_matmul(fc.read_tile(0, 96, 0, 80), exp)


def test_disk_resident_semiring(tmp_path):
    a, b = make_operands(40, 48, 56, "float32")
    exp = reference_matmul(a, b, semiring="min_plus")
    with MatrixFile(tmp_path / "a.bin", 40, 56, np.float32, create=True) as fa, \
         MatrixFile(tmp_path / "b.bin", 56, 48, np.float32, create=True) as fb, \
         MatrixFile(tmp_path / "c.bin", 40, 48, np.float32, create=True) as fc:
        fa.write_tile(0, 0, a)
        fb.write_tile(0, 0, b)
        streamed_matmul_files(fa, fb, fc, semiring="min_plus", tile_m=16,
                              tile_n=16, tile_k=32)
        verify_matmul(fc.read_tile(0, 40, 0, 48), exp)


def test_too_small_file_rejected_at_open(tmp_path):
    # A file smaller than the declared geometry must fail tileio_open with
    # an OSError — not SIGBUS the process on first out-of-range access.
    p = tmp_path / "small.bin"
    p.write_bytes(b"\x00" * 64)  # 16 float32s, far less than 64x64
    with pytest.raises(OSError):
        MatrixFile(p, 64, 64, np.float32)


def test_overflowing_geometry_rejected(tmp_path):
    p = tmp_path / "m.bin"
    with MatrixFile(p, 8, 8, np.float32, create=True):
        pass
    with pytest.raises((OSError, OverflowError, ValueError)):
        MatrixFile(p, 2**62, 2**62, np.float32)

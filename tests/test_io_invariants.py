"""Structural I/O invariants — the reference encodes its closed-form
``TotalReadsFromA/B`` as runtime asserts in every memory stage
(``kernel/Memory.cpp:109-112,167-169,208-210,268-270,294-299,404-406``);
here the same proofs run as properties: the closed-form volume must equal a
brute-force walk of the Pallas grid's block fetches."""

import numpy as np
import pytest

from gemm_hls_tpu.config import GemmConfig

RNG = np.random.default_rng(7)

CONFIGS = [
    (GemmConfig(block_m=bm, block_n=bn, block_k=bk, interpret=True), m, n, k)
    for bm, bn, bk, m, n, k in [
        (128, 128, 128, 512, 512, 512),
        (256, 512, 256, 1024, 2048, 768),
        (64, 128, 256, 64, 128, 256),
        (128, 256, 128, 384, 768, 896),
    ]
]


@pytest.mark.parametrize("cfg,m,n,k", CONFIGS)
def test_io_volume_equals_grid_walk(cfg, m, n, k):
    gm, gn, gk = cfg.grid(m, n, k)
    # Brute-force walk: every grid step fetches an A block (bm x k-total
    # over its K steps) and a B block; output written once per tile.
    reads_a = 0
    reads_b = 0
    for i in range(gm):
        for j in range(gn):
            for kk in range(gk):
                reads_a += cfg.block_m * cfg.block_k
                reads_b += cfg.block_k * cfg.block_n
    writes_c = m * n
    # The closed form counts K un-padded (the reference streams true K).
    expected = cfg.io_volume_words(m, n, k)
    padded_k = gk * cfg.block_k
    walk = (reads_a + reads_b) * k // padded_k + writes_c
    assert expected == walk


@pytest.mark.parametrize("cfg,m,n,k", CONFIGS)
def test_vmem_accounting_dominates_blocks(cfg, m, n, k):
    # The VMEM estimate must cover at least one copy of every live buffer.
    in_b = np.dtype(cfg.dtype).itemsize
    single = (cfg.block_m * cfg.block_k + cfg.block_k * cfg.block_n) * in_b \
        + cfg.block_m * cfg.block_n * np.dtype(cfg.jacc_dtype).itemsize
    assert cfg.vmem_bytes() >= single


def test_grid_covers_problem_exactly():
    for _ in range(50):
        m, n, k = (int(RNG.integers(1, 5000)) for _ in range(3))
        cfg = GemmConfig(block_m=int(RNG.choice([64, 128, 256])),
                         block_n=int(RNG.choice([128, 256])),
                         block_k=int(RNG.choice([128, 256, 512])),
                         interpret=True)
        gm, gn, gk = cfg.grid(m, n, k)
        mp, np_, kp = cfg.padded_shape(m, n, k)
        # Tiles cover the padded problem exactly, with < one block of slack.
        assert gm * cfg.block_m == mp and mp - m < cfg.block_m
        assert gn * cfg.block_n == np_ and np_ - n < cfg.block_n
        assert gk * cfg.block_k == kp and kp - k < cfg.block_k


def test_hbm_traffic_reuse_refinement():
    """hbm_traffic_bytes == io_volume_bytes when K is gridded (every block
    index changes per step), and drops exactly the (gn-1) redundant A slab
    fetches when K fits one block (pure 2-D sweep, A resident across j)."""
    from gemm_hls_tpu.config import GemmConfig

    m = n = k = 4096
    gridded = GemmConfig(dtype="bfloat16", block_m=512, block_n=512,
                         block_k=1024)
    assert gridded.hbm_traffic_bytes(m, n, k) == \
        gridded.io_volume_bytes(m, n, k)

    full_k = GemmConfig(dtype="bfloat16", block_m=512, block_n=512,
                        block_k=4096)
    gm, gn, gk = full_k.grid(m, n, k)
    assert gk == 1
    saved = full_k.io_volume_bytes(m, n, k) - full_k.hbm_traffic_bytes(m, n, k)
    assert saved == full_k.block_m * k * gm * (gn - 1) * 2  # bf16 bytes

"""CLI: analytical expectations for a problem/config — the
``PrintSpecifications N K M [frequency]`` executable's port
(``src/PrintSpecifications.cpp:4-11``).

    python -m gemm_hls_tpu.tools.print_specifications 8192 8192 8192 \
        --dtype bfloat16 [--chip v5e] [--block-m 512 --block-n 1024 --block-k 1024]
"""

from __future__ import annotations

import argparse

from gemm_hls_tpu.config import GemmConfig, default_config
from gemm_hls_tpu.models.perf_model import (
    detect_chip, format_specifications, get_chip, specifications,
)
from gemm_hls_tpu.ops.semiring import get_semiring


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("m", type=int)
    p.add_argument("n", type=int)
    p.add_argument("k", type=int)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--semiring", default="plus_times")
    p.add_argument("--chip", default=None)
    p.add_argument("--block-m", type=int, default=None)
    p.add_argument("--block-n", type=int, default=None)
    p.add_argument("--block-k", type=int, default=None)
    args = p.parse_args(argv)

    cfg = default_config(args.dtype, semiring=args.semiring)
    overrides = {}
    for name in ("block_m", "block_n", "block_k"):
        v = getattr(args, name)
        if v is not None:
            overrides[name] = v
    if overrides:
        cfg = cfg.replace(**overrides)
    chip = get_chip(args.chip) if args.chip else detect_chip()
    sr = get_semiring(args.semiring)
    spec = specifications(cfg, args.m, args.n, args.k, chip=chip,
                          semiring_is_mxu=sr.is_mxu)
    print(format_specifications(spec))
    return spec


if __name__ == "__main__":
    main()

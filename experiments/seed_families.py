"""Tune the non-dense kernel families on-chip and merge the winners into
the packaged seed (gemm_hls_tpu/data/autotune_seed.json).

Covers the shapes the docs quote: the flash benchmark/cliff shapes, the
quantized-serving shapes, and the grouped MoE suite's shape families.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python experiments/seed_families.py
"""

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SEED = REPO / "gemm_hls_tpu" / "data" / "autotune_seed.json"
SCRATCH = "/tmp/family_tune.json"


def main():
    import sys

    from gemm_hls_tpu.tools.autotune import (
        autotune_flash, autotune_flash_bwd, autotune_grouped,
        autotune_quant,
    )

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    jobs = []
    # Flash: the bench shape (B=32, S=1024, D=128) both tags — the
    # documented 52-vs-123 TF cliff lives at S=1024 under the fixed
    # (512, 2048) defaults — plus the long-seq shapes.
    for s, b in ((1024, 32), (2048, 16), (4096, 8), (8192, 4)):
        for causal in (False, True):
            jobs.append(("flash", dict(bsz=b, s_q=s, s_kv=s, d=128,
                                       causal=causal)))
            # Backward blocks merge into the same entry (bwd_block_*).
            jobs.append(("flashbwd", dict(bsz=b, s_q=s, s_kv=s, d=128,
                                          causal=causal)))
    # Quantized serving shapes (N = K = 8192).
    jobs.append(("quant", dict(m=2048, n=8192, k=8192, mode="w8a8")))
    jobs.append(("quant", dict(m=32, n=8192, k=8192, mode="int4",
                               group_size=128)))
    jobs.append(("quant", dict(m=32, n=8192, k=8192, mode="int8")))
    jobs.append(("quant", dict(m=1024, n=8192, k=8192, mode="int4",
                               group_size=128)))
    # Grouped MoE suite shape families (experiments/grouped_bench.py).
    jobs.append(("grouped", dict(m=4096, k=4096, n=4096, num_groups=8)))
    jobs.append(("grouped", dict(m=8192, k=2048, n=2048, num_groups=8)))
    jobs.append(("grouped", dict(m=2048, k=4096, n=4096, num_groups=16)))

    for fam, kw in jobs:
        if only and fam != only:
            continue
        print(f"== {fam} {kw}", flush=True)
        try:
            if fam == "flash":
                e = autotune_flash(cache_path=SCRATCH, verbose=True, **kw)
            elif fam == "flashbwd":
                e = autotune_flash_bwd(cache_path=SCRATCH, verbose=True,
                                       **kw)
            elif fam == "quant":
                e = autotune_quant(cache_path=SCRATCH, verbose=True, **kw)
            else:
                e = autotune_grouped(cache_path=SCRATCH, verbose=True, **kw)
            print(f"   -> {e}", flush=True)
        except Exception as ex:  # noqa: BLE001 — keep seeding the rest
            print(f"   FAILED: {ex}", flush=True)

    tuned = json.load(open(SCRATCH))
    seed = json.load(open(SEED))
    seed.update(tuned)
    SEED.write_text(json.dumps(seed, indent=1, sort_keys=True) + "\n")
    print(f"merged {len(tuned)} entries into {SEED}")


if __name__ == "__main__":
    main()

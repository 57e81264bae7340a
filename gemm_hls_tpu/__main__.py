"""``python -m gemm_hls_tpu`` — capability summary and CLI index."""

import jax

from gemm_hls_tpu import __version__, available_semirings
from gemm_hls_tpu.models.perf_model import detect_chip
from gemm_hls_tpu.utils.native import native_available


def main():
    chip = detect_chip()
    print(f"gemm_hls_tpu {__version__} — TPU-native communication-avoiding "
          f"semiring GEMM")
    print(f"backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s), chip model: {chip.name})")
    print(f"semirings: {', '.join(available_semirings())}")
    print(f"native oracle: {'available' if native_available() else 'unavailable'}")
    print()
    print("CLIs:")
    for mod, desc in [
        ("gemm_hls_tpu.tools.run", "run one GEMM: timing, GOp/s, verification, power model"),
        ("gemm_hls_tpu.tools.sweep", "configuration sweeps with failure taxonomy -> CSV"),
        ("gemm_hls_tpu.tools.tile_optimizer", "VMEM-budget block-size optimizer"),
        ("gemm_hls_tpu.tools.print_specifications", "analytical roofline expectations"),
        ("gemm_hls_tpu.tools.profile", "measured vs roofline + XProf trace"),
        ("gemm_hls_tpu.tools.oversize", "out-of-HBM host-staged GEMM"),
        ("gemm_hls_tpu.tools.autotune", "measure + cache the best blocks for a problem"),
        ("gemm_hls_tpu.tools.selftest", "compiled hardware battery (14 checks vs oracle)"),
    ]:
        print(f"  python -m {mod:45s} {desc}")
    print()
    print("docs: README.md, docs/DESIGN.md, PARITY.md; examples/ for runnable demos")


if __name__ == "__main__":
    main()

"""Driver contract: entry() compiles single-chip; dryrun_multichip(8) runs
the full multi-chip story on the virtual mesh."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 1024)
    assert str(out.dtype) == "float32"


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)

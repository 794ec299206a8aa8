"""Regression net for the driver hooks in __graft_entry__.py.

The driver compile-checks entry() single-chip and runs dryrun_multichip(N)
on a virtual CPU mesh; a signature or tracing break there silently fails the
round, so pin the cheap half here: entry() must return (jittable fn, args)
whose abstract trace (jax.eval_shape — no compile) produces the 256px image.
dryrun_multichip itself is exercised by the driver every round (and spawns
its own subprocess), so it is not duplicated in the suite.
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_traces_to_256px_image():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 256, 256, 3)
    # the frozen towers must travel as jit ARGUMENTS (closing over them
    # embeds every weight as an HLO constant — the axon compile tunnel
    # rejects the payload at scale; CLAUDE.md ground rule)
    assert len(args) == 4

"""Driver-contract regression tests for __graft_entry__.py.

The round-2 regression (MULTICHIP_r02.json ok=false) happened because
nothing in pytest exercised the entry module: the march-config default
change broke only the dryrun's carry structure. These tests run the
exact contract the driver scores — entry() must jit-compile and run,
and dryrun_multichip(8) must compile + execute the FULL sharded train
step on the virtual 8-device mesh — so any future break fails pytest.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as entry_mod  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = entry_mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # the forward step must advance the flow clock
    assert float(out.flow_state.t) > float(args[0].flow_state.t)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh (conftest sets it)")
    entry_mod.dryrun_multichip(8)

# Policy-as-TOML gates (reference contracts, SURVEY §4):
# - UNRUN.toml quarantine ledger is shrink-only
# - every tracked allocation has an allowlisted owner
# - every reported degradation kind is allowlisted
# - the shader-proof ledger has no unregistered runtime kernels

import tomllib
from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).parent


def _load(name):
    return tomllib.loads((HERE / name).read_text())


def test_unrun_quarantine_shrink_only():
    doc = _load("UNRUN.toml")
    quarantined = doc["quarantined"]
    assert len(quarantined) <= doc["max_entries"], (
        "quarantine list grew past its high-water mark — fix the tests "
        "instead of quarantining more")
    # every quarantined name must reference an existing test file
    for entry in quarantined:
        fname = entry.split("::")[0]
        assert (HERE / fname).exists(), f"quarantined ghost test: {entry}"


def test_allocation_gate():
    """Run a real render and assert every tracked allocation's owner
    prefix is in the allowlist (reference: test_allocation_gate.py)."""
    import forge3d_tpu as f3d
    from forge3d_tpu.mem import global_tracker

    allow = _load("allocation_allowlist.toml")["owners"]
    tracker = global_tracker()
    tracker.reset()

    y, x = np.mgrid[0:17, 0:17].astype(np.float32)
    dem = 2.0 * np.sin(x * 0.4) * np.cos(y * 0.4)
    f3d.hybrid_render_terrain_reference(
        dem, 32, 24, {"origin": (8, 8, 26), "look_at": (8, 0, 8)},
        spp=1, min_frames=1, max_frames=2, variance_threshold=1e9)

    owners = {r.name for r in tracker._resources.values()}
    unlisted = {o for o in owners if o not in allow}
    assert not unlisted, (
        f"allocations without an allowlisted owner: {sorted(unlisted)} — "
        "add them to tests/allocation_allowlist.toml with a justification")


def test_degradation_gate():
    from forge3d_tpu.degradation import (clear_native_degradations,
                                         native_degradations,
                                         record_degradation)

    allowed = set(_load("degradation_allowlist.toml")["allowed"])
    clear_native_degradations()
    record_degradation("cpu_fallback", "unit test entry")
    bad = [d for d in native_degradations()
           if d.get("category") not in allowed]
    assert not bad, f"unallowlisted degradations: {bad}"
    clear_native_degradations()
    # the gate rejects unknown kinds
    record_degradation("experimental_shortcut", "should fail the gate")
    bad2 = [d for d in native_degradations()
            if d.get("category") not in allowed]
    assert bad2, "gate failed to flag an unallowlisted degradation"
    clear_native_degradations()


def test_kernel_ledger_has_core_kernels():
    """The contract ledger must cover every shipped runtime kernel
    (the reference's shader_proofs_ledger.toml role)."""
    from forge3d_tpu.verify import registered_kernels

    required = {"terrain_reference", "megakernel", "mesh_tracer",
                "terrain_renderer", "smoke_raymarch"}
    missing = required - set(registered_kernels())
    assert not missing, f"kernels missing from the contract ledger: {missing}"

# Tests: assurance layer — Ed25519, certificates, provenance, license,
# DD precision proofs, determinism ledger.

import numpy as np
import pytest

from forge3d_tpu.assurance import ed25519
from forge3d_tpu.assurance.certificate import (begin_render_capture,
                                               certificate_public_key_hex,
                                               emit_certificate,
                                               render_execution_report,
                                               sign_render_certificate_digest,
                                               verify_render_certificate)
from forge3d_tpu.assurance.determinism import (DeterminismLedger, frame_hash,
                                               render_twice_check,
                                               topology_key)
from forge3d_tpu.assurance.license import (issue_license,
                                           license_public_key_hex,
                                           validate_license,
                                           verify_license_signature)
from forge3d_tpu.assurance.provenance import (artifact_digest, merkle_root,
                                              seal_provenance,
                                              verify_provenance)


# ---------------------------------------------------------------------------
# ed25519


def test_rfc8032_vectors():
    seed = bytes.fromhex(
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60")
    assert ed25519.public_key_from_seed(seed).hex() == (
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a")
    sig = ed25519.sign(seed, b"")
    assert sig.hex() == (
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b")
    assert ed25519.verify(ed25519.public_key_from_seed(seed), b"", sig)


def test_sign_verify_tamper():
    seed, pub = ed25519.generate_keypair(b"\x07" * 32)
    msg = b"forge3d render digest"
    sig = ed25519.sign(seed, msg)
    assert ed25519.verify(pub, msg, sig)
    assert not ed25519.verify(pub, msg + b"!", sig)
    bad = bytearray(sig)
    bad[0] ^= 1
    assert not ed25519.verify(pub, msg, bytes(bad))
    assert not ed25519.verify(pub, msg, b"short")


# ---------------------------------------------------------------------------
# certificates


def test_certificate_roundtrip():
    cap = begin_render_capture("test_render")
    cap.record_pass("trace", 12.5, rays=1000)
    cap.record_pass("shade", 3.25)
    cap.finish()
    report = render_execution_report(cap, inputs_digest="abc123")
    report["signature"] = sign_render_certificate_digest(report["digest"])
    assert verify_render_certificate(report)
    # tamper with a pass timing -> digest breaks
    report["passes"][0]["ms"] = 99.0
    assert not verify_render_certificate(report)


def test_emit_certificate(tmp_path):
    import json

    out = {}
    emit_certificate(out, "terrain", {"frames": 3,
                                      "rgba": np.zeros((4, 4, 4), np.uint8)})
    assert verify_render_certificate(out)
    p = tmp_path / "cert.json"
    emit_certificate(p, "terrain", {"frames": 1})
    assert verify_render_certificate(json.loads(p.read_text()))
    assert len(certificate_public_key_hex()) == 64


# ---------------------------------------------------------------------------
# provenance


def test_merkle_root_properties():
    leaves = [artifact_digest(bytes([i])) for i in range(5)]
    r1 = merkle_root(leaves)
    assert merkle_root(leaves) == r1              # deterministic
    assert merkle_root(leaves[:4]) != r1          # sensitive to leaf set
    swapped = leaves[:]
    swapped[0], swapped[1] = swapped[1], swapped[0]
    assert merkle_root(swapped) != r1             # order-sensitive


def test_seal_and_verify(tmp_path):
    dem = np.arange(64, dtype=np.float32).reshape(8, 8)
    png = tmp_path / "out.bin"
    png.write_bytes(b"fake output bytes")
    seal = seal_provenance({"dem": dem, "output": png},
                           metadata={"recipe": "demo"})
    ok, reasons = verify_provenance(seal, {"dem": dem, "output": png})
    assert ok, reasons
    # tampered artifact fails closed
    ok2, reasons2 = verify_provenance(seal, {"dem": dem + 1, "output": png})
    assert not ok2 and any("digest_mismatch" in r for r in reasons2)
    # tampered seal fails closed
    bad = dict(seal)
    bad["merkle_root"] = "0" * 64
    ok3, reasons3 = verify_provenance(bad)
    assert not ok3 and "merkle_root_mismatch" in reasons3
    # extra artifact not covered by the seal is reported
    ok4, reasons4 = verify_provenance(seal, {"dem": dem, "output": png,
                                             "rogue": b"x"})
    assert not ok4 and any("unsealed" in r for r in reasons4)


# ---------------------------------------------------------------------------
# license


def test_license_lifecycle():
    lic = issue_license("Test Org", features=["render", "export"],
                        expires="2030-01-01")
    assert verify_license_signature(lic)
    ok, why = validate_license(lic, now="2026-08-16")
    assert ok, why
    ok2, why2 = validate_license(lic, now="2031-01-01")
    assert not ok2 and why2 == "expired"
    lic["holder"] = "Evil Org"
    assert not verify_license_signature(lic)
    assert len(license_public_key_hex()) == 64


# ---------------------------------------------------------------------------
# DD precision (DUPLA)


def test_dd_selftest_bounds():
    from forge3d_tpu.precision import dd_selftest

    report = dd_selftest(n=200_000, seed=1)
    assert report["ok"], report
    for op in ("add", "mul", "div", "sqrt"):
        assert report[op]["max_err_u2"] <= report[op]["bound_u2"], (op, report[op])


def test_dd_exactness_small():
    from forge3d_tpu.precision import dd_add, dd_from_f64, dd_to_f64

    # f64 values unrepresentable in f32 survive a DD round-trip add
    a = dd_from_f64([1.0 + 2.0**-30])
    b = dd_from_f64([2.0**-31])
    s = dd_to_f64(dd_add(a, b))
    assert s[0] == 1.0 + 2.0**-30 + 2.0**-31


def test_dd_jitter_demo():
    from forge3d_tpu.precision import dd_jitter_demo

    rep = dd_jitter_demo(anchor=1.0e7, extent=2.0, n=512)
    assert rep["f32_max_err"] > 0.1          # f32 world coords lose decimeters
    assert rep["dd_max_err"] < 1e-6          # DD keeps micrometers
    assert rep["improvement"] > 1e4


def test_dd_harness():
    from forge3d_tpu.precision import dd_harness

    out = dd_harness("mul", [1.0000001, 3.5], [2.9999999, 7.25])
    assert out["max_abs_err"] < 1e-12
    with pytest.raises(ValueError):
        dd_harness("pow", [1.0], [2.0])


# ---------------------------------------------------------------------------
# determinism


def test_frame_hash_and_twice_check():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (16, 16, 4), np.uint8)
    assert frame_hash(img) == frame_hash(img.copy())
    assert frame_hash(img) != frame_hash(img[:, :, :3])
    ok, h1, h2 = render_twice_check(lambda: img)
    assert ok and h1 == h2


def test_determinism_ledger(tmp_path):
    ledger = DeterminismLedger(tmp_path / "determinism.json")
    img = np.full((8, 8, 4), 7, np.uint8)
    ledger.record("canonical_scene", img, topology="cpu-test-8")
    ok, why = ledger.check("canonical_scene", img, topology="cpu-test-8")
    assert ok, why
    ok2, why2 = ledger.check("canonical_scene", img + 1, topology="cpu-test-8")
    assert not ok2 and "mismatch" in why2
    ok3, _ = ledger.check("canonical_scene", img, topology="tpu-v5e-8")
    assert not ok3                                  # unknown topology fails closed
    # reload from disk
    ledger2 = DeterminismLedger(tmp_path / "determinism.json")
    ok4, _ = ledger2.check("canonical_scene", img, topology="cpu-test-8")
    assert ok4
    assert "-" in topology_key()


def test_render_twice_real_engine():
    """The terrain PT reference is bitwise run-to-run deterministic."""
    import forge3d_tpu as f3d

    n = 33
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    dem = 3.0 * np.sin(x * 0.3) * np.cos(y * 0.25)

    def render():
        out = f3d.hybrid_render_terrain_reference(
            dem, 48, 32, {"origin": (16, 12, 45), "look_at": (16, 0, 16)},
            spp=2, min_frames=2, max_frames=8, variance_threshold=1e9)
        return out["rgba"]

    ok, h1, h2 = render_twice_check(render)
    assert ok, (h1, h2)

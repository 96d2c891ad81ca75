# forge3d_tpu/assurance/provenance.py
# VERITAS provenance sealing: Merkle tree over render inputs/outputs,
# Ed25519 signature, canonical JSON seal document.
#
# Parity notes (reference behavior, not code):
# /root/reference/src/py_functions/provenance.rs +
# python/forge3d/provenance.py — `seal_provenance(paths/arrays, key)` emits
# a signed seal binding every input artifact hash into a Merkle root;
# `verify_provenance(seal, ...)` recomputes hashes and checks the chain
# fail-closed.

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .certificate import canonical_json
from .ed25519 import public_key_from_seed, sign, verify

__all__ = ["merkle_root", "seal_provenance", "verify_provenance",
           "artifact_digest"]

_SCHEMA = "forge3d-tpu/provenance-seal/v1"


def artifact_digest(artifact) -> str:
    """SHA-256 of a file path, bytes, or ndarray (shape+dtype+data)."""
    h = hashlib.sha256()
    if isinstance(artifact, (str, Path)):
        h.update(b"file\0")
        with open(artifact, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
    elif isinstance(artifact, np.ndarray):
        arr = np.ascontiguousarray(artifact)
        h.update(f"ndarray\0{arr.dtype}\0{arr.shape}\0".encode())
        h.update(arr.tobytes())
    elif isinstance(artifact, bytes):
        h.update(b"bytes\0")
        h.update(artifact)
    elif isinstance(artifact, str):
        h.update(b"text\0")
        h.update(artifact.encode())
    else:
        h.update(b"json\0")
        h.update(canonical_json(artifact).encode())
    return h.hexdigest()


def merkle_root(leaf_hashes: Sequence[str]) -> str:
    """Binary Merkle tree root over hex leaf digests (duplicate-last
    padding for odd levels; empty tree -> sha256(''))."""
    if not leaf_hashes:
        return hashlib.sha256(b"").hexdigest()
    level = [bytes.fromhex(h) for h in leaf_hashes]
    while len(level) > 1:
        if len(level) % 2:
            level.append(level[-1])
        level = [hashlib.sha256(level[i] + level[i + 1]).digest()
                 for i in range(0, len(level), 2)]
    return level[0].hex()


def seal_provenance(artifacts: Dict[str, object], *,
                    seed: Optional[bytes] = None,
                    metadata: Optional[dict] = None) -> dict:
    """Create a signed provenance seal over named artifacts.

    Returns the seal document: {schema, artifacts: {name: digest},
    merkle_root, metadata, public_key, signature}.
    """
    from .certificate import _DEV_SEED

    seed = seed or _DEV_SEED
    names = sorted(artifacts)
    digests = {name: artifact_digest(artifacts[name]) for name in names}
    root = merkle_root([digests[n] for n in names])
    body = {
        "schema": _SCHEMA,
        "artifacts": digests,
        "merkle_root": root,
        "metadata": metadata or {},
    }
    payload = canonical_json(body).encode()
    signature = sign(seed, payload)
    return {**body,
            "public_key": public_key_from_seed(seed).hex(),
            "signature": signature.hex()}


def verify_provenance(seal: dict,
                      artifacts: Optional[Dict[str, object]] = None,
                      *, public_key_hex: Optional[str] = None
                      ) -> Tuple[bool, List[str]]:
    """Verify a seal: signature, Merkle root consistency, and (when
    artifacts are provided) recomputed digests. Fail-closed: any mismatch
    returns (False, reasons)."""
    reasons: List[str] = []
    body = {k: seal[k] for k in ("schema", "artifacts", "merkle_root",
                                 "metadata") if k in seal}
    if body.get("schema") != _SCHEMA:
        reasons.append("bad_schema")
    names = sorted(body.get("artifacts", {}))
    root = merkle_root([body["artifacts"][n] for n in names])
    if root != body.get("merkle_root"):
        reasons.append("merkle_root_mismatch")
    pk_hex = public_key_hex or seal.get("public_key", "")
    try:
        payload = canonical_json(body).encode()
        ok_sig = verify(bytes.fromhex(pk_hex), payload,
                        bytes.fromhex(seal.get("signature", "")))
    except ValueError:
        ok_sig = False
    if not ok_sig:
        reasons.append("bad_signature")
    if artifacts is not None:
        for name, digest in body.get("artifacts", {}).items():
            if name not in artifacts:
                reasons.append(f"missing_artifact:{name}")
            elif artifact_digest(artifacts[name]) != digest:
                reasons.append(f"digest_mismatch:{name}")
        for name in artifacts:
            if name not in body.get("artifacts", {}):
                reasons.append(f"unsealed_artifact:{name}")
    return (not reasons), reasons

# forge3d_tpu/assurance/license.py
# Offline Ed25519 license verification.
#
# Parity notes (reference behavior, not code): /root/reference/src/license/
# mod.rs + python/forge3d/{_license,_ed25519}.py verify a signed license
# blob against a baked-in public key, fully offline; seams
# `license_public_key_hex` and `verify_license_signature`.

from __future__ import annotations

import hashlib
import json
from typing import Optional, Tuple

from .certificate import canonical_json
from .ed25519 import public_key_from_seed, sign, verify

__all__ = ["license_public_key_hex", "verify_license_signature",
           "issue_license", "validate_license"]

# Deterministic project signing key (dev). Production builds replace the
# baked public key without shipping any seed.
_ISSUER_SEED = hashlib.sha256(b"forge3d-tpu license issuer v1").digest()
_PUBLIC_KEY_HEX = public_key_from_seed(_ISSUER_SEED).hex()


def license_public_key_hex() -> str:
    return _PUBLIC_KEY_HEX


def issue_license(holder: str, *, features: Optional[list] = None,
                  expires: Optional[str] = None,
                  seed: Optional[bytes] = None) -> dict:
    """Create a signed license document (test/dev issuance path)."""
    body = {"schema": "forge3d-tpu/license/v1", "holder": holder,
            "features": sorted(features or ["full"]),
            "expires": expires}
    sig = sign(seed or _ISSUER_SEED, canonical_json(body).encode())
    return {**body, "signature": sig.hex()}


def verify_license_signature(license_doc: dict,
                             public_key_hex: Optional[str] = None) -> bool:
    """Signature check only (reference seam: verify_license_signature)."""
    body = {k: v for k, v in license_doc.items() if k != "signature"}
    try:
        pk = bytes.fromhex(public_key_hex or _PUBLIC_KEY_HEX)
        sig = bytes.fromhex(license_doc.get("signature", ""))
    except ValueError:
        return False
    return verify(pk, canonical_json(body).encode(), sig)


# Matches the reference's post-expiry grace window (_license.py checks
# date.today() with a 14-day grace period).
GRACE_DAYS = 14


def validate_license(license_doc, *, now: Optional[str] = None
                     ) -> Tuple[bool, str]:
    """Full validation: schema + signature + expiry (ISO dates compare
    lexicographically).

    `now` defaults to the current UTC date, so expiry always fails closed;
    pass an explicit ISO date for deterministic tests. A license within
    GRACE_DAYS past expiry validates with reason "grace".
    """
    if isinstance(license_doc, (str, bytes)):
        try:
            license_doc = json.loads(license_doc)
        except json.JSONDecodeError:
            return False, "malformed"
    if license_doc.get("schema") != "forge3d-tpu/license/v1":
        return False, "bad_schema"
    if not verify_license_signature(license_doc):
        return False, "bad_signature"
    expires = license_doc.get("expires")
    if expires is not None:
        import datetime

        if now is None:
            now = datetime.datetime.now(datetime.timezone.utc).date().isoformat()
        if now > expires:
            try:
                exp_date = datetime.date.fromisoformat(expires[:10])
                now_date = datetime.date.fromisoformat(now[:10])
            except ValueError:
                return False, "expired"
            if (now_date - exp_date).days <= GRACE_DAYS:
                return True, "grace"
            return False, "expired"
    return True, "ok"

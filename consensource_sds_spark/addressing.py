"""Sawtooth addressing for the certificate_registry family.

The reference delegates to ``common::addressing`` (consensource-common,
pinned git dep — /root/reference/Cargo.toml:14): a 70-hex-char address is
``namespace (6) | address-space infix (2) | entity-key hash (62)``.
``get_family_namespace_prefix()`` = first 6 hex chars of
sha256("certificate_registry"); ``get_address_type()`` dispatches on chars
7-8 (usage: event_handler.rs:139, subscriber.rs:212).

The infix-per-type assignment below is this package's own (the crate source
is not vendored in the reference); it is used consistently by the fixture
encoder and the decoder, and is a single point of change.
"""

from __future__ import annotations

import hashlib

FAMILY_NAME = "certificate_registry"

#: First 6 hex chars of sha256(family name) — derivable public fact ("439a56").
NAMESPACE = hashlib.sha256(FAMILY_NAME.encode()).hexdigest()[:6]

#: address-space infix (chars 7-8 of the address, 0-indexed [6:8]).
ADDRESS_SPACE_INFIX = {
    "agent": "00",
    "certificate": "01",
    "organization": "02",
    "standard": "03",
    "request": "04",
    "assertion": "05",
}
INFIX_TO_SPACE = {v: k for k, v in ADDRESS_SPACE_INFIX.items()}

def make_address(space: str, natural_key: str) -> str:
    """Build a deterministic 70-char address for an entity (fixtures/tests)."""
    infix = ADDRESS_SPACE_INFIX[space]
    tail = hashlib.sha256(natural_key.encode()).hexdigest()[:62]
    return NAMESPACE + infix + tail

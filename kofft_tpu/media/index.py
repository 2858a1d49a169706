"""Song identification index: filename metadata first, content hash second.

Reference: ``src/media/index.rs:27-87``. Lookup order preserved exactly:
identify() checks the by-name map first (no hashing), then the by-hash map,
then auto-inserts. The reference hashes with BLAKE3; this environment has
no blake3 module, so the default is hashlib.blake2b (32-byte digest,
documented divergence — the hash is an internal key, the *strategy* is the
contract) with a pluggable ``hasher``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional


@dataclass(frozen=True)
class SongId:
    """Unique identifier for a song (the indexed path)."""
    path: Path


def _blake2b_file(path: Path) -> bytes:
    h = hashlib.blake2b(digest_size=32)
    with open(path, "rb") as f:
        while True:
            chunk = f.read(8192)
            if not chunk:
                break
            h.update(chunk)
    return h.digest()


class SongIndex:
    """Hybrid name/content-hash index (reference ``SongIndex``)."""

    def __init__(self, hasher: Optional[Callable[[Path], bytes]] = None):
        self._by_name: dict[str, SongId] = {}
        self._by_hash: dict[bytes, SongId] = {}
        self._hash = hasher or _blake2b_file

    def index_song(self, path) -> SongId:
        """Hash and store by name + hash (reference ``index_song``,
        ``index.rs:55-64``)."""
        p = Path(path)
        digest = self._hash(p)
        sid = SongId(p)
        if p.name:
            self._by_name[p.name] = sid
        self._by_hash[digest] = sid
        return sid

    def identify(self, path) -> SongId:
        """Name lookup first (no hashing), then hash lookup, then
        auto-insert (reference ``identify``, ``index.rs:71-87``)."""
        p = Path(path)
        if p.name and p.name in self._by_name:
            return self._by_name[p.name]
        digest = self._hash(p)
        if digest in self._by_hash:
            return self._by_hash[digest]
        sid = SongId(p)
        if p.name:
            self._by_name[p.name] = sid
        self._by_hash[digest] = sid
        return sid

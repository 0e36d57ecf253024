"""From-scratch deterministic POSIX ustar writer.

The shard sink (`operators/shard_sink`) serializes training samples into
tar shards (the WebDataset convention: one tar per shard, sample files
sharing a basename).  The writer composes ustar headers from the spec
(POSIX.1-1988, the 512-byte header layout) rather than delegating to the
stdlib, for two reasons:

- **Determinism**: every varying field (mtime, uid/gid, uname/gname,
  mode) is pinned, so the same samples always produce byte-identical
  shards — blob caches and re-run idempotency checks can key on content
  hashes.
- **Roundtrip independence**: tests and the q83 verify stage read shards
  back with the stdlib ``tarfile`` module, a genuinely separate
  implementation — a bug here cannot cancel against itself.

Scope: regular files only, names <= 100 bytes (sample keys are short by
construction); sizes up to the 11-digit octal field (8 GiB - 1), far above
any sane shard entry.
"""

from __future__ import annotations

_BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    """Zero-padded octal field with trailing NUL (the ustar number form)."""
    s = f"{n:0{width - 1}o}"
    if len(s) >= width:
        raise ValueError(f"value {n} overflows a {width}-byte octal field")
    return s.encode() + b"\x00"


def _header(name: str, size: int) -> bytes:
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError(f"tar entry name longer than 100 bytes: {name!r}")
    h = bytearray(_BLOCK)
    h[0:len(nb)] = nb                      # name
    h[100:108] = _octal(0o644, 8)          # mode
    h[108:116] = _octal(0, 8)              # uid
    h[116:124] = _octal(0, 8)              # gid
    h[124:136] = _octal(size, 12)          # size
    h[136:148] = _octal(0, 12)             # mtime (pinned: epoch)
    h[148:156] = b" " * 8                  # chksum placeholder (spaces)
    h[156:157] = b"0"                      # typeflag: regular file
    h[257:263] = b"ustar\x00"              # magic
    h[263:265] = b"00"                     # version
    # uname/gname left empty (NULs); devmajor/devminor/prefix all zero
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def tar_bytes(entries: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``entries`` (name, payload) into one ustar archive, in the
    given order, ending with the two-zero-block trailer.  Deterministic:
    same entries -> same bytes."""
    out = bytearray()
    for name, data in entries:
        out += _header(name, len(data))
        out += data
        pad = (-len(data)) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)

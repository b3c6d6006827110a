"""User-pluggable codec registry — the RegisterEncoding analog
(/root/reference/encoding.go:97-106).

A custom codec supplies vectorized encode/decode over the engine's value
containers (ndarray for fixed kinds, ByteArrays for BYTE_ARRAY) and
declares which physical kinds it supports (the canEncode analog,
encoding.go:136-160). Registered codecs participate in the chunk
container (`encode_chunk(codec=my_id)`) and, when `selectable=True`, in
the auto-selector's trial shortlist.

Deployment note (Spark): registration is per-Python-process. Executors
re-import modules shipped via --py-files, so register your codec at
import time of a module your job imports (e.g. the module that defines
it), exactly like the reference requires RegisterEncoding to run before
any read/write touches the format code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

# ids 0-9 are parquet format codes, 200 is FSST — custom codecs must
# stay clear of both (mirrors format/parquet.go:580-631 + our extension)
RESERVED_IDS = set(range(0, 10)) | {200}
CUSTOM_ID_MIN = 128


@dataclass(frozen=True)
class CustomCodec:
    codec_id: int
    name: str
    kinds: frozenset  # Kind.* values this codec can encode
    encode: Callable  # (values, kind) -> bytes
    decode: Callable  # (buf, n, kind) -> values
    selectable: bool = False  # participate in auto-selector trials
    shortlist: Callable | None = field(default=None)  # (stats) -> bool


_REGISTRY: dict[int, CustomCodec] = {}


def register(codec: CustomCodec) -> None:
    if codec.codec_id in RESERVED_IDS or codec.codec_id < CUSTOM_ID_MIN:
        raise ValueError(
            f"codec id {codec.codec_id} reserved; use ids ≥ {CUSTOM_ID_MIN} "
            f"outside {sorted(RESERVED_IDS)}"
        )
    if codec.codec_id in _REGISTRY and _REGISTRY[codec.codec_id].name != codec.name:
        raise ValueError(
            f"codec id {codec.codec_id} already registered as "
            f"{_REGISTRY[codec.codec_id].name!r}"
        )
    _REGISTRY[codec.codec_id] = codec


def unregister(codec_id: int) -> None:
    _REGISTRY.pop(codec_id, None)


def lookup(codec_id: int) -> CustomCodec | None:
    return _REGISTRY.get(codec_id)


def selectable_for(stats: dict) -> list[int]:
    """Custom codec ids that want to compete for this chunk's stats."""
    out = []
    for c in _REGISTRY.values():
        if not c.selectable or stats.get("kind") not in c.kinds:
            continue
        if c.shortlist is None or c.shortlist(stats):
            out.append(c.codec_id)
    return out

"""Frequent-items sketch (Misra-Gries variant), dict-backed.

Mirrors frequencies/sketch.rs semantics: bounded map of item->count with a
global undercount ``offset``; purge subtracts the median of retained counts
and drops <=0 entries (frequencies/sketch.rs:256-264, maybe_resize_or_purge
:372, reverse_purge_item_hash_map.rs:130-146). Exact while distinct items
< 0.75 * max_map_size (frequencies/mod.rs:43-44); error (UB-LB) <= W * eps,
eps = 3.5/M (frequencies/mod.rs:54).

Batch-vectorized: updates arrive as (items, counts) arrays (the Spark
partial pass pre-reduces each Arrow batch with pandas value_counts before
touching the dict).

Query semantics follow frequencies/sketch.rs:317-356:
NO_FALSE_POSITIVES -> lower_bound > threshold;
NO_FALSE_NEGATIVES -> upper_bound > threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from datasketches_rust_spark.sketches import serde

NO_FALSE_POSITIVES = "no_false_positives"
NO_FALSE_NEGATIVES = "no_false_negatives"
_LOAD = 0.75  # purge threshold fraction (frequencies/mod.rs:43-44)


@dataclass
class FrequentItemsSketch:
    max_map_size: int
    counts: dict = field(default_factory=dict)
    offset: int = 0
    total_weight: int = 0

    def __post_init__(self) -> None:
        if self.max_map_size & (self.max_map_size - 1):
            raise ValueError("max_map_size must be a power of two")

    def epsilon(self) -> float:
        return 3.5 / self.max_map_size

    def update_counts(self, items, weights) -> "FrequentItemsSketch":
        c = self.counts
        for item, w in zip(items, weights):
            c[item] = c.get(item, 0) + int(w)
            self.total_weight += int(w)
        self._maybe_purge()
        return self

    def update(self, item, weight: int = 1) -> "FrequentItemsSketch":
        return self.update_counts([item], [weight])

    def _maybe_purge(self) -> None:
        limit = int(_LOAD * self.max_map_size)
        while len(self.counts) > limit:
            med = int(np.median(np.fromiter(self.counts.values(),
                                            dtype=np.int64)))
            med = max(med, 1)
            self.counts = {k: v - med for k, v in self.counts.items()
                           if v - med > 0}
            self.offset += med

    # -- query (frequencies/sketch.rs:161-189, 317-356) -----------------------
    def estimate(self, item) -> int:
        c = self.counts.get(item, 0)
        return c + self.offset if c else 0

    def lower_bound(self, item) -> int:
        return self.counts.get(item, 0)

    def upper_bound(self, item) -> int:
        return self.counts.get(item, 0) + self.offset

    def frequent_items(self, error_type: str = NO_FALSE_POSITIVES,
                       threshold: int | None = None) -> list[tuple]:
        """[(item, estimate, lb, ub)] sorted by estimate desc."""
        thr = self.offset if threshold is None else max(threshold, self.offset)
        out = []
        for item, c in self.counts.items():
            lb, ub = c, c + self.offset
            keep = lb > thr if error_type == NO_FALSE_POSITIVES else ub > thr
            if keep:
                out.append((item, ub, lb, ub))
        out.sort(key=lambda t: (-t[1], str(t[0])))
        return out

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        """Replay counts; offsets add (frequencies/sketch.rs:282-295)."""
        if self.max_map_size != other.max_map_size:
            raise serde.SketchDecodeError("incompatible freq-items configs")
        out = FrequentItemsSketch(self.max_map_size, dict(self.counts),
                                  self.offset + other.offset,
                                  self.total_weight + other.total_weight)
        for item, c in other.counts.items():
            out.counts[item] = out.counts.get(item, 0) + c
        out._maybe_purge()
        return out

    # v2: versioned binary layout (replaces the v1 pickle payload — this
    # is shuffle state, and pickle-loading at deserialize was the one
    # non-versioned-binary sketch format in the engine). Items carry a
    # type tag the way the reference delegates to an items serde
    # (ArrayOfItemsSerDe in datasketches-java); str/int/float/bytes cover
    # every column type the agg layer feeds in.
    VERSION = 2
    _TAGS = {str: 1, int: 2, float: 3, bytes: 4}

    def serialize(self) -> bytes:
        import struct
        hdr = serde.pack_header(serde.FAMILY_FREQUENCY, self.VERSION, 1)
        out = [hdr, struct.pack("<IqqI", self.max_map_size, self.offset,
                                self.total_weight, len(self.counts))]
        for item, c in self.counts.items():
            if isinstance(item, np.generic):
                item = item.item()  # numpy scalars (value_counts index)
            tag = self._TAGS.get(type(item))
            if tag is None:
                raise TypeError(
                    f"unsupported freq-items item type {type(item)!r}; "
                    "use str/int/float/bytes")
            if tag == 1:
                body = item.encode("utf-8")
            elif tag == 2:
                body = struct.pack("<q", item)
            elif tag == 3:
                body = struct.pack("<d", item)
            else:
                body = item
            out.append(struct.pack("<BIq", tag, len(body), c))
            out.append(body)
        return b"".join(out)

    @classmethod
    def deserialize(cls, buf: bytes) -> "FrequentItemsSketch":
        import struct
        off = serde.unpack_header(buf, serde.FAMILY_FREQUENCY, cls.VERSION, 1)
        serde.need(buf, off, 24)
        m, offset, tw, n = struct.unpack_from("<IqqI", buf, off)
        off += 24
        counts: dict = {}
        for _ in range(n):
            serde.need(buf, off, 13)
            tag, blen, c = struct.unpack_from("<BIq", buf, off)
            off += 13
            serde.need(buf, off, blen)
            body = buf[off:off + blen]
            off += blen
            if tag == 1:
                item = body.decode("utf-8")
            elif tag == 2:
                (item,) = struct.unpack("<q", body)
            elif tag == 3:
                (item,) = struct.unpack("<d", body)
            elif tag == 4:
                item = bytes(body)
            else:
                raise serde.SketchDecodeError(f"unknown item tag {tag}")
            counts[item] = c
        return cls(m, counts, offset, tw)

"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side machinery — schema, Arrow batching, ``mapInPandas``
signature, partition-preserving flow — is real and tested; the actual
codec work is stubbed (this container has no image/audio libs): with PIL
installed the real decoder runs, otherwise a clearly-marked deterministic
fake derives metadata from the payload's md5 so tests and oracles stay
exact.

Scale notes: binary payloads ride the columnar format untouched (parquet
stores them page-compressed); metadata extraction is one ``mapInPandas``
pass — Arrow batches in, Arrow batches out, no shuffle. Frame-sampling /
resize land the same way: batch-wise Pandas transforms over binary columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not in the test container
    from PIL import Image  # type: ignore # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

_FORMATS = ("png", "jpeg", "webp", "gif")


def attach_binary_payload(df: DataFrame, src_col: str = "text",
                          out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a source
    column; in production: the raw image/audio bytes)."""
    return df.withColumn(out_col, F.col(src_col).cast(BinaryType()))


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image decode: width/height/format derived
    from the payload md5. Used when PIL is absent OR the payload is not a
    decodable image (the synthetic corpora are utf-8 text bytes)."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[0:4], 16) % 640
    height = int(h[4:8], 16) % 480
    fmt = _FORMATS[int(h[8], 16) % len(_FORMATS)]
    return width, height, fmt


def _open_image(payload: bytes):
    """PIL image for the payload, or None (no PIL / not a valid image).
    Every real codec path below funnels through this so installing PIL
    upgrades behavior per-payload without ever breaking the pipeline."""
    if not HAVE_PIL:
        return None
    import io

    try:
        img = Image.open(io.BytesIO(payload))
        img.load()
        return img
    except Exception:
        return None


def extract_image_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Decode metadata from a binary column via mapInPandas (Arrow batches).

    With PIL this would open each payload; without, the deterministic fake
    keeps the full pipeline testable (and DuckDB-oracle-checkable, since the
    fake is pure md5 arithmetic).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = []
            for p in payloads:
                raw = bytes(p)
                img = _open_image(raw)
                if img is not None:  # pragma: no cover - needs PIL
                    metas.append(
                        (img.width, img.height, (img.format or "raw").lower())
                    )
                else:
                    metas.append(_fake_decode(raw))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "format": [m[2] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_META_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame", BinaryType(), True),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("features", StringType(), True),  # csv of 8 floats
    ]
)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Batch image resize over binary payloads (mapInPandas; Arrow batches).

    Decodable payloads (PIL present) resize for real — grayscale convert +
    ``resize((w, h))`` + raw ``tobytes()``, so the output contract is the
    same width*height bytes the stub emits; anything else falls back to the
    deterministic truncated/padded stub so partitioning, batch shapes, and
    output schema are exercised identically either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            target = width * height

            def one(p: bytes) -> bytes:
                img = _open_image(p)
                if img is not None:  # pragma: no cover - needs PIL
                    return img.convert("L").resize((width, height)).tobytes()
                # ljust: a zero-length payload still yields width*height bytes
                return (
                    p * (target // max(len(p), 1) + 1)
                ).ljust(target, b"\0")[:target]

            out = [one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled
    frame (mapInPandas fan-out — the multimodal analogue of explode).

    Multi-frame payloads PIL can open (animated GIF/WebP) sample n_frames
    evenly across the real frame sequence (raw grayscale bytes per frame);
    everything else falls back to equal byte-slices of the payload. A true
    video codec is out of scope for this container — the row-fanout shape
    (1 -> n_frames) is the part that matters for partitioning and memory
    at scale, and it is identical on both paths.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                img = _open_image(raw)
                if img is not None and getattr(img, "n_frames", 1) > 1:
                    # pragma: no cover - needs PIL
                    total = img.n_frames
                    for j in range(n_frames):
                        img.seek(min(j * total // n_frames, total - 1))
                        ids.append(int(i))
                        idxs.append(j)
                        frames.append(img.convert("L").tobytes())
                    continue
                step = max(len(raw) // n_frames, 1)
                for j in range(n_frames):
                    ids.append(int(i))
                    idxs.append(j)
                    frames.append(raw[j * step:(j + 1) * step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Feature extraction stub: 8 deterministic floats from the payload md5
    (a real extractor would run an image/audio model over the batch —
    same mapInPandas shape, GPU-friendly batch size via
    spark.sql.execution.arrow.maxRecordsPerBatch)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[payload_col]:
                h = hashlib.md5(bytes(p)).hexdigest()
                vals = [int(h[i * 4:(i + 1) * 4], 16) / 65535.0 for i in range(8)]
                feats.append(",".join(f"{v:.6f}" for v in vals))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=FEATURE_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("ahash", LongType(), True),
    ]
)


def ahash64(df: DataFrame, id_col: str = "doc_id",
            payload_col: str = "payload") -> DataFrame:
    """64-bit average hash (aHash) of each binary payload — the classic
    perceptual image fingerprint: downscale, threshold each cell against
    the mean, pack the bits. Near-identical payloads differ in few bits,
    so Hamming distance finds visually-duplicate media that byte-exact
    hashing misses.

    The stub 'decode' average-pools the raw byte stream into 64 cells —
    locality-preserving exactly like a real downscale (a small payload
    edit perturbs one cell), so the Hamming-space behavior is faithful;
    with PIL the same pooling runs over real grayscale pixels. One
    mapInPandas pass, no shuffle.

    The threshold is *integer-exact*: bit_i = (cell_sum_i * n_bytes >
    total_sum * cell_len_i) — cross-multiplication instead of float means,
    so the hash is bit-identical in any engine and the whole op is
    DuckDB-oracle-checkable (q79) despite being a Python mapInPandas."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf[payload_col]:
                raw = bytes(p)
                img = _open_image(raw)
                if img is not None:  # pragma: no cover - needs PIL
                    raw = img.convert("L").tobytes()  # real grayscale pixels
                arr = np.frombuffer(raw, dtype=np.uint8)
                n = int(arr.size)
                if n == 0:
                    out.append(0)
                    continue
                total = int(arr.sum(dtype="int64"))
                val = 0
                for c in np.array_split(arr, 64):
                    s, ln = int(c.sum(dtype="int64")), int(c.size)
                    bit = 1 if s * n > total * ln else 0
                    val = (val << 1) | bit
                # two's-complement into a signed 64-bit long
                if val >= 1 << 63:
                    val -= 1 << 64
                out.append(val)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "ahash": out}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AHASH_SCHEMA)


def ahash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 6,
                         max_bucket_size: int | None = None,
                         collapse_identical: bool = False,
                         probe_bits: int | None = None) -> DataFrame:
    """Near-duplicate media pairs by aHash Hamming distance, COMPLETE for
    the given radius: the 64 bits split into ``max_hamming + 1`` bands
    (np.array_split widths) — a pair differing in at most ``max_hamming``
    bits can dirty at most that many bands, so at least one band key
    matches exactly (pigeonhole needs d+1 bands; the pre-r5 fixed 4x16
    banding silently dropped pairs at distance 4+ whose diffs spread
    across all four bands). Band equi-joins propose, one exact
    xor+bit_count filter verifies — never an all-pairs comparison, but
    note the trade: wider radii mean narrower bands (64/(d+1) bits) and
    fatter candidate buckets; keep max_hamming small at corpus scale.

    ``max_bucket_size`` drops band buckets larger than the cap before
    pairing — the same guard lsh_candidate_pairs carries, and media
    corpora NEED it more: web crawls hold thousands of byte-identical
    logos/blank images whose shared hash makes one bucket quadratic
    (the K=16 soak measured identical-hash buckets alone producing
    178k pairs; SCALE.md "aHash soak adjudication"). Capping trades
    pigeonhole COMPLETENESS for boundedness: pairs inside a dropped
    bucket are missed unless another band proposes them — pass
    ``collapse_identical=True`` (below) and, with ``probe_bits=0``, the
    cap then only ever drops non-discriminative bands. Default None
    keeps the exact pigeonhole contract (oracles q79/q164 replay it).
    With ``probe_bits=1`` the cap applies to BOTH sides of the
    candidate join — the exact keys and the probed (1-bit-neighborhood)
    keys — so the per-key candidate bound stays cap^2 (r8 behavior
    change; previously the probe side was uncapped and a fat
    neighborhood could reach cap x |bucket|, but pair sets the old
    one-sided cap emitted can now be dropped — see CHANGELOG.md). The
    collapse_identical guarantee is correspondingly WEAKER under
    probing: a key whose 1-bit NEIGHBORHOOD is fat can be dropped from
    the probe side even when every individual band bucket is small and
    discriminative, so collapse+cap+probing is still a recall trade,
    not a free bound.

    ``collapse_identical=True`` makes the exact-dedup-first idiom an
    operator guarantee instead of caller discipline (q123's exact-set
    collapse, applied here): equal-ahash docs fold to one min-id
    representative BEFORE banding, the candidate join runs over
    distinct hashes only (so byte-identical web media can never make a
    band bucket quadratic), and the pairs expand back afterwards —
    identical-hash families via a members self-equi-join on ahash
    (hamming 0, true output), cross-family pairs via two member joins
    on (ha, hb). Output is IDENTICAL to the uncollapsed run when
    ``max_bucket_size`` is None (parity-tested); with a cap it is
    strictly safer, since capping can then only drop buckets that are
    fat from many *distinct* hashes sharing one band key.

    ``probe_bits=1`` switches candidate generation to HmSearch-style
    1-bit variant probing (Zhang et al., "HmSearch: an efficient Hamming
    distance query processing algorithm", SSDBM 2013 — public paper):
    ceil((d+1)/2) WIDE bands instead of d+1 narrow ones (pigeonhole: if
    every band differed by >= 2 bits the total would exceed d, so some
    band differs by <= 1 bit), with the probe side exploding each band
    key into itself + its single-bit flips and joining against the exact
    keys. Output is IDENTICAL to the default (complete for the radius +
    same exact verify; parity-tested); the win is selectivity at WIDE
    radii, where d+1 narrow bands saturate: at d=10 the default's 11
    bands carry ~5.8 bits (<= ~56 distinct keys — every bucket is fat by
    construction, measured quadratic in SCALE.md's payload-disjoint
    soak), while probing uses 6 bands of ~10.7 bits (~1,700 keys) at the
    cost of ~(64/m)x more probe-side rows — ~5-6x fewer candidate pairs.

    ``probe_bits`` DEFAULTS by radius (r8, turning SCALE.md's prose
    guidance into code): ``None`` resolves to 1 when ``max_hamming >= 8``
    — the regime where d+1 narrow bands are fat-by-construction (the
    payload-disjoint soak measured the d=10 default plan at 118.9x per
    16x data; probing held 12.2x with identical output) — and 0 below
    it, where narrow bands still carry >= 8 discriminative bits and the
    simpler plan wins. Pass 0 or 1 explicitly to pin a strategy (the
    oracles pin theirs). Independently of the chosen strategy, a band
    layout whose keys carry < 8 bits (< 256 distinct keys — every
    corpus-scale bucket is fat no matter the data) raises a
    ``UserWarning`` naming the saturation; with probing that fires only
    at radius >= 16, matching the measured saturation wall."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    if probe_bits not in (None, 0, 1):
        raise ValueError(
            f"probe_bits must be None, 0 or 1, got {probe_bits}"
        )
    if probe_bits is None:
        probe_bits = 1 if max_hamming >= 8 else 0
    n_bands = max_hamming + 1 if probe_bits == 0 else (max_hamming + 2) // 2
    base, rem = divmod(64, n_bands)
    if base < 8:  # < 256 distinct keys per band: saturated by construction
        import warnings

        warnings.warn(
            f"ahash_near_dup_pairs: {n_bands} bands over 64 bits leave only "
            f"{base}-bit band keys (<= {1 << (base + (1 if rem else 0))} "
            f"distinct values) — every band bucket is fat by construction "
            f"at corpus scale and candidate generation degrades toward "
            f"all-pairs (measured 118.9x per 16x data at max_hamming=10 "
            f"with probe_bits=0; SCALE.md r7 media soak). Use probe_bits=1 "
            f"and/or a smaller max_hamming (radius <= 4-6 recommended; "
            f"probing saturates too at radius >= ~16).",
            UserWarning,
            stacklevel=2,
        )
    widths = [base + 1 if b < rem else base for b in range(n_bands)]
    starts = [sum(widths[:b]) for b in range(n_bands)]
    h = hashes.select(F.col("doc_id").alias("id"), "ahash")
    members = h
    if collapse_identical:
        h = h.groupBy("ahash").agg(F.min("id").alias("id"))

    def _lit64(v: int):
        # two's-complement wrap into a signed Spark LongType literal:
        # (1 << 64) - 1 and 1 << 63 are unrepresentable as unsigned
        # python ints passed to F.lit (NumberFormatException at plan
        # build) — the n_bands == 1 regimes (max_hamming 0, or <= 1
        # with probing) hit both
        return F.lit(v - (1 << 64) if v >= 1 << 63 else v)

    def band(b):
        return F.shiftrightunsigned(
            F.col("ahash"), 64 - starts[b] - widths[b]
        ).bitwiseAND(_lit64((1 << widths[b]) - 1))

    # ONE (band_idx, band_key) self-equi-join over the posexploded band
    # array — pairs propose iff the SAME band matches (<= probe_bits
    # apart), exactly as per-band joins would, but in one stage (through
    # round 5 this was n_bands separate self-joins union'd: same shuffled
    # bytes spread over n_bands stages of fixed overhead — the q40
    # union-branch anti-pattern)
    kv = h.select(
        "id", "ahash",
        F.posexplode(F.array(*[band(b).alias(f"band{b}")
                               for b in range(n_bands)])).alias("bi", "k"),
    )
    from chemharmony_spark.operators.dedup import cap_buckets

    kv = cap_buckets(kv, ["bi", "k"], max_bucket_size)
    left = kv.select(F.col("id").alias("a"), F.col("ahash").alias("ha"),
                     "bi", "k")
    if probe_bits == 0:
        right = kv.select(F.col("id").alias("b"), F.col("ahash").alias("hb"),
                          "bi", "k")
    else:
        # probe side: each band key + its single-bit flips. A band pair
        # <= 1 bit apart matches in BOTH directions (x-exact vs
        # y-variant and y-exact vs x-variant), so the a < b filter below
        # loses nothing.
        variants = []
        for b in range(n_bands):
            variants.append(F.struct(F.lit(b).alias("bi"),
                                     band(b).alias("k")))
            variants.extend(
                F.struct(F.lit(b).alias("bi"),
                         band(b).bitwiseXOR(_lit64(j1)).alias("k"))
                for j1 in (1 << j for j in range(widths[b]))
            )
        right = h.select(
            F.col("id").alias("b"), F.col("ahash").alias("hb"),
            F.explode(F.array(*variants)).alias("e"),
        ).select("b", "hb", F.col("e.bi").alias("bi"), F.col("e.k").alias("k"))
        # cap the probe side too: a probe bucket for key (bi, k) holds the
        # exact-key members PLUS every 1-bit neighbor's members, so capping
        # only the exact side would bound pairs per key at cap x |probe
        # bucket| — unbounded on a fat neighborhood. Symmetric capping
        # restores the cap^2 per-key bound the docstring promises (at the
        # price of dropping keys whose NEIGHBORHOOD is fat even when the
        # exact bucket is small — capping is already a recall trade, and
        # collapse_identical keeps it bounded to non-discriminative bands).
        right = cap_buckets(right, ["bi", "k"], max_bucket_size)
    cand = (
        left.join(right, on=["bi", "k"])
        .where(F.col("a") < F.col("b"))
        .drop("bi", "k")
    )
    verified = (
        cand.dropDuplicates(["a", "b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    if not collapse_identical:
        return verified.select("a", "b", "hamming")
    # Expand representative pairs back to member pairs. Rep pairs always
    # span DISTINCT hashes (groupBy folded equal ones), so hamming >= 1
    # there and the hamming-0 intra-family pairs below never overlap.
    ma = members.select(F.col("id").alias("ma"), F.col("ahash").alias("ha"))
    mb = members.select(F.col("id").alias("mb"), F.col("ahash").alias("hb"))
    cross = (
        verified.select("ha", "hb", "hamming")
        .join(ma, "ha")
        .join(mb, "hb")
        .select(
            F.least("ma", "mb").alias("a"),
            F.greatest("ma", "mb").alias("b"),
            "hamming",
        )
    )
    intra = (
        members.select(F.col("id").alias("a"), "ahash")
        .join(members.select(F.col("id").alias("b"), "ahash"), "ahash")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.lit(0).cast("integer").alias("hamming"))
    )
    return cross.unionByName(intra)

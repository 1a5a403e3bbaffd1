"""Entity resolution: exact + blocked-fuzzy matching (SURVEY.md §2.3
J1-J5 — the reference's most distinctive operator subgraph,
etl2_advclean_and_dimcreatin.py:195-244).

Pipeline shape (all stages lazy, composable):

1. exact broadcast left join on normalized compound keys (J1);
2. LEFT ANTI staging — fuzzy matching runs only on what exact missed (J2);
3. blocked candidate generation — equi-join on (prefix block key, exact
   attrs) bounds the Levenshtein candidate space from |probe|x|catalog|
   to per-block (J4). Blocking is query *formulation*: no optimizer can
   invent it, and it is the one reference idea that transfers directly
   to 100 TB near-dup work (the MinHash-LSH operator generalizes it);
4. edit-distance filter (<= threshold) + deterministic top-1 per probe
   key via row_number ordered (distance, catalog id) (J5);
5. unionByName(exact, fuzzy) with missing-column tolerance (U1).

Scale notes: the catalog side is broadcast when small (dimension-sized);
for a huge catalog drop the broadcast hint and let AQE pick — the block
key equi-join still shuffles only matching blocks. Skewed blocks (a very
common 2-char prefix) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FUZZY_THRESHOLD = 3  # reference: etl2_advclean_and_dimcreatin.py:60
BLOCK_PREFIX_LEN = 2  # reference: etl2_advclean_and_dimcreatin.py:222


def norm(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(col))


def resolve_exact_fuzzy(
    probe: DataFrame,
    catalog: DataFrame,
    probe_key: str,
    probe_text: str,
    catalog_id: str,
    catalog_text: str,
    extra_exact_keys: list[tuple[str, str]] | None = None,
    threshold: int = FUZZY_THRESHOLD,
    block_len: int = BLOCK_PREFIX_LEN,
    broadcast_catalog: bool = True,
    probe_key_unique: bool = False,
    catalog_id_unique: bool = False,
) -> DataFrame:
    """Resolve each probe row to a catalog id, exactly when possible and
    by bounded edit distance otherwise.

    Returns columns: ``probe_key``, RESOLVED_ID, LEV_DIST (null for exact
    matches), IS_FUZZY_MATCH. Unmatched probe keys are absent (the caller
    left-joins the result back, mirroring the reference's fact assembly
    at etl2:256-258).

    ``extra_exact_keys``: (probe_col, catalog_col) pairs that must match
    exactly in both stages (the reference uses make-year, etl2:210,231).

    ``probe_key_unique`` / ``catalog_id_unique``: set True when the caller
    guarantees one row per key (a deduplicated stage, a dimension) to skip
    the defensive dropDuplicates — each skip removes a full shuffle of
    that side, which at fact scale is one of the two big exchanges in the
    whole resolution subgraph.
    """
    extra = extra_exact_keys or []
    cat = catalog.select(
        F.col(catalog_id).alias("__cat_id"),
        norm(catalog_text).alias("__cat_text"),
        *[norm(c).alias(f"__cat_x{i}") for i, (_, c) in enumerate(extra)],
    )
    if not catalog_id_unique:
        cat = cat.dropDuplicates(["__cat_id"])
    maybe_bc = F.broadcast(cat) if broadcast_catalog else cat

    pro = probe.select(
        F.col(probe_key).alias("__probe_key"),
        norm(probe_text).alias("__probe_text"),
        *[norm(p).alias(f"__pro_x{i}") for i, (p, _) in enumerate(extra)],
    )
    if not probe_key_unique:
        pro = pro.dropDuplicates(["__probe_key"])

    # Conditions reference columns by (unique) name, not by parent
    # DataFrame, so Spark's ambiguous-self-join detection never trips even
    # when probe and catalog share lineage (as in dim-from-same-data).
    exact_cond = F.col("__probe_text") == F.col("__cat_text")
    for i in range(len(extra)):
        exact_cond = exact_cond & (F.col(f"__pro_x{i}") == F.col(f"__cat_x{i}"))

    # 1) exact: broadcast left join (J1, etl2:206-213)
    joined = pro.join(maybe_bc, exact_cond, "left").select(
        "__probe_key", "__probe_text", *[f"__pro_x{i}" for i in range(len(extra))],
        F.col("__cat_id").alias("__exact_id"),
    )
    # Distinct catalog ids can share normalized text (case/whitespace
    # variants hash to different ids but normalize equal); without a
    # tiebreak the exact stage would emit multiple rows per probe key and
    # break the one-row-per-probe contract (and the fact grain downstream).
    # Deterministic rule: lowest catalog id wins — mirroring the fuzzy
    # stage's (distance, id) order (etl2:236).
    resolved_exact = (
        joined.filter(F.col("__exact_id").isNotNull())
        .groupBy("__probe_key")
        .agg(F.min("__exact_id").alias("RESOLVED_ID"))
    )

    # 2) anti staging: only unresolved keys go fuzzy (J2, etl2:216-220)
    unresolved = pro.join(
        resolved_exact.select("__probe_key"), on="__probe_key", how="left_anti"
    )

    # 3) blocked candidates (J4, etl2:221-232)
    blocked_probe = unresolved.withColumn(
        "__probe_block", F.substring(F.col("__probe_text"), 1, block_len)
    ).filter(F.length("__probe_block") >= block_len)
    blocked_cat = cat.withColumn(
        "__cat_block", F.substring(F.col("__cat_text"), 1, block_len)
    ).filter(F.length("__cat_block") >= block_len)
    maybe_bc_blocked = F.broadcast(blocked_cat) if broadcast_catalog else blocked_cat

    cand_cond = F.col("__probe_block") == F.col("__cat_block")
    for i in range(len(extra)):
        cand_cond = cand_cond & (F.col(f"__pro_x{i}") == F.col(f"__cat_x{i}"))

    candidates = (
        blocked_probe.join(maybe_bc_blocked, cand_cond, "inner")
        .withColumn("LEV_DIST", F.levenshtein(F.col("__probe_text"), F.col("__cat_text")))
        .filter(F.col("LEV_DIST") <= threshold)
    )

    # 4) deterministic best match (J5, etl2:236-238)
    w = Window.partitionBy("__probe_key").orderBy(
        F.col("LEV_DIST").asc(), F.col("__cat_id").asc()
    )
    best_fuzzy = (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__probe_key", F.col("__cat_id").alias("RESOLVED_ID"), "LEV_DIST")
    )

    # 5) union with missing-column tolerance (U1, etl2:243-244)
    merged = resolved_exact.unionByName(best_fuzzy, allowMissingColumns=True)
    merged = merged.withColumn(
        "IS_FUZZY_MATCH",
        F.when(F.col("RESOLVED_ID").isNotNull() & F.col("LEV_DIST").isNotNull(), True).otherwise(
            False
        ),
    )
    return merged.withColumnRenamed("__probe_key", probe_key)

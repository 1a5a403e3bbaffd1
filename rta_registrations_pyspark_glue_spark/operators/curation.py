"""End-to-end corpus curation: the Lee-et-al.-shaped chain every
training-data pipeline runs, wired as ONE dataflow.

The pieces exist separately (textdedup.duplication_stats,
minhash_lsh_candidates + jaccard_verify, graph.dedup_clusters,
graph.priority_survivors, sampling.hash_split); what a real pipeline
needs is their *composition with the right stage interactions*:

1. substring-duplication filter FIRST — a doc that is mostly
   boilerplate (license text, navigation chrome) is dropped before it
   can pollute near-dup clustering or win a survivor contest;
2. MinHash+LSH near-dup clustering over the SURVIVING docs only
   (candidate generation on filtered text is both cheaper and more
   selective — boilerplate-heavy docs no longer bridge unrelated
   clusters);
3. source-priority survivor selection within each cluster (keep the
   curated copy, drop the crawl copy);
4. leakage-safe train/val/test split keyed on CLUSTER id, so a
   near-duplicate of a training doc can never land in the test set.

The output is one row PER INPUT DOC carrying every decision — the
duplication verdict, the cluster assignment, the survivor verdict, the
split — so the frame is simultaneously the curated corpus
(``filter(final_keep)``), the drop audit, and the split manifest. At
100 TB every stage keeps its own scale shape: the spans index is one
inverted-index shuffle linear in token volume, LSH is bounded by
bucket occupancy, components by the near-dup regime's island sizes,
and the split is a scan-side hash — composing them adds only the two
semi-joins that narrow the corpus between stages.

This is the LLM-pipeline analogue of plans/pipeline.py's
rta_pipeline_star (the reference's staged ETL chain,
etl1_clean_and_stage.py -> etl2_advclean_and_dimcreatin.py): several
verified operators fused into one hash-pinnable DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.caching import tracked_persist
from rta_registrations_pyspark_glue_spark.operators import graph, sampling, textdedup


def curate_corpus(
    corpus: DataFrame,
    priorities: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    max_dup_fraction: float = 0.5,
    jaccard_threshold: float = 0.35,
    split_fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Run the full curation chain over ``corpus`` (id_col, text_col).

    ``priorities`` is (id_col, priority) — lower wins, missing ranks
    last (graph.priority_survivors semantics).

    Returns one row per input doc:
      (id_col, n_tokens, dup_tokens, dup_fraction, dup_keep,
       cluster_id, cluster_size, keep_doc_id, survivor, split,
       final_keep)
    where cluster_id/cluster_size/keep_doc_id/survivor/split are NULL
    for docs dropped by the duplication filter (they never reach
    clustering), and ``final_keep`` = dup_keep AND survivor — the
    curated corpus is ``filter(final_keep)``.
    """
    # localCheckpoint, not just persist: the stats frame sits on top of
    # the spans inverted-index plan (window hashes -> explode ->
    # windows), and every stage below joins against it — persisting
    # dedups EXECUTION but Catalyst still re-ANALYZES the full logical
    # tree per action, which dominated the composite's wall clock
    # (29.6s -> 1.2s for the components stage alone at sf0.01 once the
    # lineage is cut here). The frame is one short row per doc, so the
    # checkpoint is small at any scale.
    stats = textdedup.duplication_stats(
        corpus,
        text_col=text_col,
        id_col=id_col,
        span_tokens=span_tokens,
        min_docs=min_docs,
        max_dup_fraction=max_dup_fraction,
    ).localCheckpoint()
    # Stage gate: only docs passing the duplication filter enter
    # near-dup detection. Semi-join keeps the text column flowing
    # without widening the stats frame; persisted because it feeds
    # signature building and BOTH sides of the verification join.
    kept = tracked_persist(
        corpus.join(
            stats.filter(F.col("keep")).select(id_col), on=id_col, how="semi"
        )
    )
    cands = textdedup.minhash_lsh_candidates(kept, text_col=text_col, id_col=id_col)
    # Same lineage cut before the iterative components loop: the pair
    # list is tiny (near-dup verified pairs) but its plan carries the
    # whole LSH + filter chain.
    pairs = textdedup.jaccard_verify(
        cands, kept, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    ).localCheckpoint()
    clusters = graph.dedup_clusters(kept.select(id_col), pairs, id_col=id_col)
    split = sampling.hash_split(clusters, "cluster_id", fractions=split_fractions)
    surv = graph.priority_survivors(split, priorities, id_col=id_col)
    decisions = surv.select(
        id_col,
        "cluster_id",
        "cluster_size",
        "keep_doc_id",
        F.col("keep").alias("survivor"),
        "split",
    )
    return (
        stats.withColumnRenamed("keep", "dup_keep")
        .join(decisions, on=id_col, how="left")
        .select(
            id_col,
            "n_tokens",
            "dup_tokens",
            "dup_fraction",
            "dup_keep",
            "cluster_id",
            "cluster_size",
            "keep_doc_id",
            "survivor",
            "split",
            F.coalesce(F.col("survivor"), F.lit(False)).alias("final_keep"),
        )
    )

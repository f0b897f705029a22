"""Persisted BM25 inverted index: the text-retrieval sibling of
ann_index — build once, append incrementally, serve term queries reading
only the queried terms' partition buckets.

    index_path/
      meta.json                     {n_docs, sum_dl, n_buckets, id_col,
                                     folded: [...]}
      postings/bucket=<b>/batch=batch_<i>/   (term, doc_id, tf, dl) rows

Postings are partitioned by a salted-md5 TERM BUCKET, so a query for a
handful of terms lists only those buckets' directories (disk pruning —
proven the same corrupt-the-rest way as the ANN tests).  Per-doc length
rides denormalized in every posting row: serving needs no second table
and no corpus scan.  Corpus stats (n_docs, sum_dl) are additive, so
appends are exactly-once through the same folded-batch-id accounting as
the CMS/ANN stores; per-term document frequency is computed from the
postings at serve time — always consistent with what is actually stored.

Scoring mirrors text.bm25_topk's integer-exact inputs with one
difference, forced by serving from sparse postings: per-term
contributions are rounded to 6 dp and summed as scaled integers (the
in-query ranker adds unrounded terms in fixed list order — impossible
here, where a doc's matched terms arrive as rows whose float-add order
would be partition-dependent).  Rounding-then-integer-summing restores
order independence; tests pin exact equality against an independent
Python replay of this math.

Greenfield Spark work (no reference counterpart).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import md5_long, tokens

_META = "meta.json"
_POSTINGS = "postings"
_SCALE = 1_000_000


def _write_json_atomic(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def term_bucket(term, n_buckets: int):
    return F.pmod(md5_long(term), F.lit(n_buckets)).cast("int")


def _postings(df: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").cast("long").alias("dl"))
    return per_doc.join(dl, id_col).select(
        "term",
        id_col,
        "tf",
        "dl",
        term_bucket(F.col("term"), n_buckets).alias("bucket"),
    )


def _corpus_stats(df: DataFrame, text_col: str, id_col: str) -> tuple[int, int]:
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    row = toks.groupBy(id_col).count().agg(
        F.count("*").cast("long"), F.sum("count").cast("long")
    ).first()
    return int(row[0]), int(row[1] or 0)


def build_text_index(
    spark,
    df: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    batch_id: int = 0,
) -> dict:
    """Tokenize, aggregate (term, doc) postings with denormalized doc
    length, store partitioned by term bucket.  Doc ids must be unique
    across all batches ever folded (the standard corpus contract)."""
    meta_path = os.path.join(index_path, _META)
    if os.path.exists(meta_path):
        raise ValueError(
            f"text index already exists at {index_path}; "
            "rebuild requires removing it first"
        )
    os.makedirs(index_path, exist_ok=True)
    n_docs, sum_dl = _corpus_stats(df, text_col, id_col)
    p = _postings(df, text_col, id_col, n_buckets).withColumn(
        "batch", F.lit(f"batch_{batch_id}")
    )
    p.write.partitionBy("bucket", "batch").parquet(
        os.path.join(index_path, _POSTINGS)
    )
    meta = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "n_buckets": n_buckets,
        "id_col": id_col,
        # pinned read schema: serving never samples parquet footers for
        # inference — required for pruning to be airtight (an inference
        # pass may open files in buckets the query never touches) and a
        # listing-time win on large trees
        "schema": json.loads(p.schema.json()),
        "folded": [f"batch_{batch_id}"],
    }
    _write_json_atomic(meta_path, meta)
    return meta


def append_to_text_index(
    spark,
    df: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    batch_id: int,
) -> bool:
    """Fold new documents: postings land in their per-batch partition
    dirs (retries overwrite only their own), then n_docs/sum_dl commit
    with the folded id — the additive-stats exactly-once contract."""
    with open(os.path.join(index_path, _META)) as fh:
        meta = json.load(fh)
    bid = f"batch_{batch_id}"
    if bid in meta["folded"]:
        return False
    id_col = meta["id_col"]
    n_docs, sum_dl = _corpus_stats(df, text_col, id_col)
    (
        _postings(df, text_col, id_col, meta["n_buckets"])
        .withColumn("batch", F.lit(bid))
        .write.partitionBy("bucket", "batch")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(index_path, _POSTINGS))
    )
    meta["n_docs"] += n_docs
    meta["sum_dl"] += sum_dl
    meta["folded"] = meta["folded"] + [bid]
    _write_json_atomic(os.path.join(index_path, _META), meta)
    return True


def text_index_search(
    spark,
    index_path: str,
    query_terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score, rank) — BM25 top-k for ``query_terms`` served from
    the stored postings.  Reads ONLY the queried terms' buckets (partition
    pruning), computes per-term df from the matched postings (always
    consistent with storage), scores with 6-dp-rounded term contributions
    summed as scaled integers (order-independent), and ranks via
    TakeOrdered."""
    with open(os.path.join(index_path, _META)) as fh:
        meta = json.load(fh)
    id_col, n_docs, sum_dl = meta["id_col"], meta["n_docs"], meta["sum_dl"]
    terms = sorted(set(t.lower() for t in query_terms))
    import hashlib

    def _py_bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % meta["n_buckets"]

    buckets = sorted({_py_bucket(t) for t in terms})
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(meta["schema"])
    hits = (
        spark.read.schema(schema)
        .parquet(os.path.join(index_path, _POSTINGS))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    dfreq = hits.groupBy("term").agg(
        F.count("*").cast("long").alias("__df")
    )
    scored_terms = hits.join(F.broadcast(dfreq), "term")
    tf = F.col("tf").cast("double")
    dfq = F.col("__df").cast("double")
    n = F.lit(float(n_docs))
    rel_dl = F.col("dl").cast("double") * n / F.lit(float(sum_dl))
    idf = F.log(F.lit(1.0) + (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)))
    term_score = idf * (
        tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * rel_dl))
    )
    per_doc = (
        scored_terms.select(
            id_col,
            F.round(term_score, 6).alias("__ts"),
        )
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.round(F.col("__ts") * _SCALE).cast("long"))
                / F.lit(float(_SCALE))
            ).alias("score")
        )
    )
    ranked = per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))

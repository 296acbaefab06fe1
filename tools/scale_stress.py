"""Scale-up stress: replicate the sf0.1 tables N-fold (key-offset
copies, so entity/order cardinality actually grows) into a temp dir,
then time representative queries at 1x vs Nx — the direct "would this
survive a scale-up" measurement (wall time should grow ~linearly; a
super-linear jump exposes a hidden quadratic or a spill).

    python tools/scale_stress.py [factor] [query ...]

Writes the replicated tables under artifacts/scale_stress_<factor>x/
(deleted on exit unless KEEP_STRESS_DATA=1).

Workload-shape fidelity:

- Key offsets are computed per key DOMAIN (custkey, orderkey, ...),
  not per table, so FK->PK joins line up inside every replica even on
  data where a FK domain's max differs from the PK's (standard TPC-H
  has customers with no orders).
- Replica documents get a per-WORD replica suffix ("tok" -> "tok·rI"),
  which renames EVERY shingle: cross-replica Jaccard is exactly 0, so
  the dup/near-dup pair graph of the Nx corpus is precisely N disjoint
  copies of the 1x graph. (A doc-level suffix token would leave
  cross-replica Jaccard at ~S/(S+1) ~ 0.9 — far above near-dup
  thresholds — and quadratically inflate the pair graph instead of
  scaling it.)
- Timing methodology is bench.py's own `time_query` (plan built
  outside the timed region, noop sink, cache cleared between reps),
  so ratios here are comparable to the bench numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys


#: table -> list of (column, key domain); offsets are per DOMAIN so
#: cross-table joins stay aligned inside each replica
KEYED_TABLES = {
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey")],
    "customer": [("c_custkey", "custkey")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
}
COPY_TABLES = ("region", "nation", "supplier", "part")

SF_DIR = "/root/testdata/sf0.1"
REPS = 3


def replicate(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    # pass 1: one offset per key DOMAIN = 1 + max over every column
    # mapped to it (never per table — see module docstring)
    domain_max: dict[str, int] = {}
    sources = {}
    for name, cols in KEYED_TABLES.items():
        src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        sources[name] = src
        for col, domain in cols:
            m = src.agg(F.max(col)).first()[0] or 0
            domain_max[domain] = max(domain_max.get(domain, 0), m)
    offsets = {d: m + 1 for d, m in domain_max.items()}

    for name, cols in KEYED_TABLES.items():
        src = sources[name]
        parts = []
        for i in range(factor):
            p = src
            for col, domain in cols:
                p = p.withColumn(col, F.col(col) + F.lit(i * offsets[domain]))
            if name == "documents" and i > 0:
                # per-WORD suffix: renames every shingle, so replicas
                # share NO n-grams and the near-dup graph is exactly
                # N disjoint copies of the 1x graph
                p = p.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1·r{i}"),
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in COPY_TABLES:
        shutil.copyfile(  # copyfile: don't inherit the source's 0444 mode
            os.path.join(SF_DIR, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def shared_vocab_permutations(spark, factor: int):
    """Per-replica permutations of the corpus' FIXED word vocabulary
    (r13, VERDICT r12 #4): replica ``r`` maps token ``w`` to
    ``vocab[sigma_r(idx(w))]`` where ``sigma_r`` orders the vocabulary
    by ``xxhash64(word, r)`` — a deterministic, replica-distinct
    bijection of the SHARED vocabulary (the sf0.1 documents corpus has
    31 distinct tokens), instead of the per-word ``·rN`` rename whose
    1000x vocabulary made every scaled doc OOV to a fixed 1x-trained
    reference model.

    Why this shape keeps every gate invariant honest:
    - exact-dup structure per replica is preserved EXACTLY (a bijection
      applied uniformly maps identical texts to identical texts,
      distinct to distinct);
    - within-replica Jaccard is preserved EXACTLY (shingle sets are
      renamed bijectively), so the near-dup graph is still N copies of
      the 1x graph up to per-replica LSH re-rolls;
    - cross-replica shingle overlap drops to random-pair levels (two
      independent permutations agree on a bigram with p ~ 1/V², and
      random 54-token docs over a 31-word vocab already share ~5%
      containment) — far below near-dup thresholds, though NOT exactly
      zero the way the rename variant was: chance-level decontamination
      hits at scale are expected and banded by the gate, not assumed
      away;
    - every replica token is IN the 1x vocabulary, so a FIXED bigram-LM
      or NB reference scores scaled docs over the same 31x31 transition
      table it was trained on — the fix for the r12 gate's degenerate
      0.25% ppl pass rate at 1000x.

    Returns (vocab, perm_rows) where perm_rows is a list of
    (replica_id, permuted_vocab_array) for replicas 1..factor-1
    (replica 0 keeps original text)."""
    import pyspark.sql.functions as F
    import struct as _struct
    import hashlib

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    vocab = sorted(
        r[0]
        for r in docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
        .collect()
    )

    def _h(word: str, r: int) -> int:
        # driver-side stand-in for a seeded 64-bit hash (md5 prefix —
        # deterministic across runs/platforms, unlike PYTHONHASHSEED)
        d = hashlib.md5(f"{word}\x1f{r}".encode()).digest()
        return _struct.unpack("<Q", d[:8])[0]

    perm_rows = []
    for r in range(1, factor):
        order = sorted(range(len(vocab)), key=lambda i: _h(vocab[i], r))
        # entry i = image of vocab word i under sigma_r
        image = [None] * len(vocab)
        for newpos, i in enumerate(order):
            image[i] = vocab[newpos]
        perm_rows.append((r, image))
    return vocab, perm_rows


def replicate_range(
    spark,
    factor: int,
    out_dir: str,
    tables: tuple[str, ...] | None = None,
    partitions: int = 64,
    text_mode: str = "disjoint",
) -> None:
    """Constant-plan N-fold replication for LARGE factors: crossJoin each
    table with a broadcast ``factor``-row replica index instead of a
    factor-way ``unionByName`` — :func:`replicate`'s plan (and its codegen)
    grows O(factor) and a 1000-way union is where Catalyst planning time
    and generated-method size stop being free. Semantics are identical:
    per-DOMAIN key offsets (replica 0 bit-identical to 1x), documents get
    the per-word replica suffix for r > 0 (here via a column-valued
    ``regexp_replace`` replacement, replica id baked into every token).

    ``tables`` restricts which keyed tables are replicated (the mapping
    1000x gate only needs orders+lineitem — replicating the text tables
    1000x would triple the corpus for queries that never read them); the
    small dimension tables are always copied through, and (ADVICE r10
    #5) the NON-replicated keyed tables are copied through at 1x too, so
    every registry query finds its parquet — but a cross-SCALE join
    (replicated orders against 1x customer) only matches replica 0 and
    is out of contract. Key offsets are computed over ALL keyed tables
    regardless of the restriction, so a future split replication (e.g.
    orders without customer) cannot mis-offset a shared key domain. The
    source is repartitioned BEFORE the fan-out so ``partitions`` tasks
    each expand their slice locally — replicated rows are never
    shuffled.
    """
    from pyspark.sql import functions as F

    if text_mode not in ("disjoint", "shared_vocab"):
        raise ValueError(
            f"text_mode must be 'disjoint' or 'shared_vocab', got {text_mode!r}"
        )
    names = list(tables) if tables is not None else list(KEYED_TABLES)
    os.makedirs(out_dir, exist_ok=True)
    perm_df = idx_map = None
    if text_mode == "shared_vocab" and "documents" in names:
        vocab, perm_rows = shared_vocab_permutations(spark, factor)
        perm_df = spark.createDataFrame(
            perm_rows, "__pr long, __perm array<string>"
        )
        idx_entries = []
        for i, w in enumerate(vocab):
            idx_entries += [F.lit(w), F.lit(i + 1)]
        idx_map = F.create_map(*idx_entries)
    domain_max: dict[str, int] = {}
    sources = {}
    for name in KEYED_TABLES:
        src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        if name in names:
            sources[name] = src
        for col, domain in KEYED_TABLES[name]:
            m = src.agg(F.max(col)).first()[0] or 0
            domain_max[domain] = max(domain_max.get(domain, 0), m)
    offsets = {d: m + 1 for d, m in domain_max.items()}

    reps = F.broadcast(spark.range(factor).withColumnRenamed("id", "__r"))
    for name in names:
        src = sources[name]
        out = src.repartition(partitions).crossJoin(reps)
        for col, domain in KEYED_TABLES[name]:
            out = out.withColumn(
                col,
                (F.col(col) + F.col("__r") * F.lit(offsets[domain])).cast(
                    src.schema[col].dataType
                ),
            )
        if name == "documents" and text_mode == "shared_vocab":
            # shared-vocab mode (r13): permute the fixed vocabulary per
            # replica instead of renaming it — broadcast join pulls the
            # replica's permuted-vocab array (replica 0 has no row and
            # keeps its text bit-identical to 1x), then a pure map-side
            # transform rewrites each token via the tiny literal
            # word->index map + an array index. try_element_at: ANSI-safe
            # null on an unexpected token, coalesced back to itself.
            out = out.join(
                F.broadcast(perm_df), out["__r"] == perm_df["__pr"], "left"
            )
            permuted = F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.coalesce(
                        F.try_element_at(
                            F.col("__perm"), F.try_element_at(idx_map, w)
                        ),
                        w,
                    ),
                ),
            )
            out = out.withColumn(
                "text",
                F.when(F.col("__perm").isNull(), F.col("text")).otherwise(
                    permuted
                ),
            ).drop("__pr", "__perm")
        elif name == "documents":
            out = out.withColumn(
                "text",
                F.when(F.col("__r") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        F.lit(r"(\S+)"),
                        F.concat(F.lit("$1·r"), F.col("__r").cast("string")),
                    )
                ),
            )
        out = out.select(*[f.name for f in src.schema.fields])
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    passthrough = list(COPY_TABLES) + [
        n for n in KEYED_TABLES if n not in names
    ]
    for name in passthrough:
        shutil.copyfile(
            os.path.join(SF_DIR, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )
    # variant marker (r13): consumers that depend on the TEXT variant
    # (the corpus-pipeline gate needs shared_vocab) check this instead
    # of guessing from dir existence — a dir replicated under the other
    # mode is regenerated, not silently consumed
    with open(os.path.join(out_dir, "_corpus_variant.json"), "w") as f:
        json.dump({"text_mode": text_mode, "factor": factor}, f)


def main() -> int:
    try:
        factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    except ValueError:
        print(f"usage: {sys.argv[0]} [factor:int] [query ...]; "
              f"got non-integer factor {sys.argv[1]!r}")
        return 2
    names = sys.argv[2:] or ["corr_mapping", "minhash_dedup", "dtw_summary",
                             "exact_dedup", "pack_export",
                             # r5 text folds (dup-span; LM+NB) — tracked
                             # so a scaling regression in them is visible
                             "token_counts", "quality_score"]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from bench import time_query
    from mapping_timeseries_spark.session import get_spark

    qs = dict(entry_mod.queries())
    qs["pack_export"] = entry_mod.q_pack_export
    unknown = [n for n in names if n not in qs]
    if unknown:  # fail BEFORE the expensive replication step
        print(f"unknown queries: {unknown}; known: {sorted(qs)}")
        return 2

    spark = get_spark("scale-stress", master="local[32]",
                      extra_conf={"spark.driver.memory": "16g"})
    spark.range(1000).selectExpr("sum(id)").collect()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"scale_stress_{factor}x",
    )
    print(f"replicating {factor}x into {out_dir} ...")
    replicate(spark, factor, out_dir)

    try:
        for name in names:
            times = {}
            for label, sf_dir in (("1x", SF_DIR), (f"{factor}x", out_dir)):
                times[label] = statistics.median(
                    time_query(spark, qs[name], sf_dir, REPS)
                )
            ratio = times[f"{factor}x"] / max(times["1x"], 1e-9)
            print(
                f"{name}: 1x={times['1x']:.2f}s {factor}x={times[f'{factor}x']:.2f}s "
                f"ratio={ratio:.2f} (linear would be <= {factor}.0)"
            )
    finally:
        if not os.environ.get("KEEP_STRESS_DATA"):
            shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

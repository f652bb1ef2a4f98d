"""Streaming corpus ingestion with dedup against persistent indexes — the
streaming face of the batch dedup ladder (north-star extension; the batch
counterparts are ``qcatalog/dedup.py`` / ``operators/dedup.py``).

A 100 TB corpus is not built in one batch: documents arrive continuously
and each micro-batch must be deduplicated (a) within itself and (b)
against everything already ingested, WITHOUT rescanning the corpus — the
probes hit compact persistent indexes, work ∝ batch, not corpus:

- **exact stage**: min-id survivor per content hash within the batch,
  then a left-anti probe of the content-hash index.
- **near-dup stage** (optional, ``bucket_dir``): MinHash→LSH-band buckets
  of the batch probe the persistent bucket index for corpus candidates
  (plus in-batch bucket collisions); candidates are verified by exact
  n-gram Jaccard — only |candidates| pairs, never a corpus join — and a
  batch doc is dropped if it near-matches the corpus or a smaller-id
  batch peer (the chain-min rule of ``operators/semdedup.py``).

Exactly-once discipline under foreachBatch's at-least-once contract:
documents, hashes, and buckets are written to epoch-partitioned
directories (``epoch=N``) with per-epoch overwrite, and every index/corpus
probe EXCLUDES the current epoch's partition — a replayed epoch recomputes
the identical survivor set from the same inputs and overwrites its own
previous output, never double-appends and never mistakes its own
half-written state for prior corpus content.

Contract: document ids are unique across the stream's lifetime (standard
for ingest pipelines; the survivor rules key on them).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window, functions as F
from ..session import CHECKPOINT_LEVEL


def _read_epochs(spark, path: str) -> DataFrame | None:
    """Epoch-partitioned parquet state, or None if none exists yet.
    Probed THROUGH Spark (not os.path) so the state dirs can live on any
    Hadoop-compatible filesystem, not just the driver's local disk."""
    try:
        return spark.read.parquet(path)
    except Exception as e:  # [PATH_NOT_FOUND] / empty dir on first batch
        msg = str(e)
        # Error-class tags are Spark-4-era; older AnalysisException carries
        # only the prose form ("Path does not exist: ..."), and a hard fail
        # here kills the FIRST micro-batch of every stream on such versions
        # (ADVICE r4) — match both generations.
        if any(
            tag in msg
            for tag in (
                "PATH_NOT_FOUND",
                "UNABLE_TO_INFER_SCHEMA",
                "Path does not exist",
                "Unable to infer schema",
            )
        ):
            return None
        raise


def _guard_epoch_collision(prior: DataFrame | None, epoch_id: int) -> None:
    """Fail fast when the streaming checkpoint was reset against existing
    state dirs: restarted epoch ids would alias committed partitions —
    the own-epoch exclusion would treat old data as half-written state
    and the per-epoch overwrite would DELETE it.  With the matching
    checkpoint a replay re-runs only the newest uncommitted epoch, so
    ``epoch_id < max(existing)`` can only mean a checkpoint mismatch."""
    if prior is None:
        return
    mx = prior.agg(F.max("epoch")).collect()[0][0]
    if mx is not None and epoch_id < mx:
        raise ValueError(
            f"epoch {epoch_id} < existing max epoch {mx}: the streaming "
            "checkpoint does not match these state dirs (was it deleted?). "
            "Reuse the original checkpointLocation or start with fresh "
            "corpus/index/bucket dirs."
        )


def _small(df: DataFrame, limit_rows: int = 1_000_000) -> bool:
    """Broadcast the index probe only while it is genuinely small — a
    bounded count probe, not a full scan (``limit(n+1).count()``)."""
    return df.limit(limit_rows + 1).count() <= limit_rows


def dedup_ingest_writer(
    corpus_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_dir: str | None = None,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    clean_fn=None,
):
    """``foreachBatch`` writer: exact stage always; near-dup stage when
    ``bucket_dir`` is given (see module docstring for both).

    ``clean_fn`` (optional ``DataFrame -> DataFrame``) is the quality
    gate applied to every batch BEFORE any dedup state is touched — the
    place for the batch operators (``c4_line_filter`` + a keep filter,
    ``pii_redact``, ``linear_quality_score`` thresholds) in the
    streaming path.  It MUST be deterministic and must preserve
    ``id_col``/``text_col``: at-least-once replay re-applies it to the
    same rows and relies on identical output for idempotence (the same
    contract as the dedup stages themselves).  Rows it drops never
    reach the fingerprint index, so a later replay cannot resurrect
    them."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if clean_fn is not None:
            batch_df = clean_fn(batch_df)
        # null text hashes to a sentinel so empty-content rows dedup as
        # one group (md5(NULL) is NULL, and NULL join keys never match —
        # without this every batch would append its own null-text row)
        hashed = batch_df.withColumn(
            "__h",
            F.coalesce(F.md5(F.col(text_col).cast("binary")), F.lit("__null__")),
        )
        rn = Window.partitionBy("__h").orderBy(F.asc(id_col))
        survivors = (
            hashed.withColumn("__rn", F.row_number().over(rn))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        idx = _read_epochs(spark, index_dir)  # partition col: epoch
        _guard_epoch_collision(idx, epoch_id)
        if idx is not None:
            prior = idx.filter(F.col("epoch") != epoch_id).select(
                F.col("fingerprint").alias("__h")
            )
            survivors = survivors.join(
                F.broadcast(prior) if _small(prior) else prior, "__h", "left_anti"
            )
        survivors = survivors.localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)  # multiple consumers

        buckets = None
        if bucket_dir is not None:
            survivors, buckets = _near_dup_stage(
                spark, survivors, epoch_id, corpus_dir, bucket_dir,
                id_col, text_col, jaccard_threshold,
                shingle_n, num_hashes, rows_per_band,
            )

        survivors.drop("__h").write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"epoch={epoch_id}")
        )
        survivors.select(F.col("__h").alias("fingerprint")).write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, f"epoch={epoch_id}"))
        if buckets is not None:
            buckets.write.mode("overwrite").parquet(
                os.path.join(bucket_dir, f"epoch={epoch_id}")
            )

    return write


def _near_dup_stage(
    spark,
    survivors: DataFrame,
    epoch_id: int,
    corpus_dir: str,
    bucket_dir: str,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int,
    num_hashes: int,
    rows_per_band: int,
) -> tuple[DataFrame, DataFrame]:
    """MinHash/LSH near-dup filter for one batch.  Returns (surviving
    rows, their final bucket index rows)."""
    from ..operators.dedup import (
        lsh_buckets,
        lsh_candidate_pairs,
        minhash_signatures,
        verify_candidate_pairs,
    )

    docs = survivors.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    buckets = lsh_buckets(
        minhash_signatures(docs, "doc_id", "text", num_hashes, shingle_n),
        rows_per_band,
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)

    # in-batch candidates (a_id < b_id) + corpus candidates (a=new, b=old)
    cand = lsh_candidate_pairs(buckets).withColumn("__from_corpus", F.lit(False))
    bucket_state = _read_epochs(spark, bucket_dir)
    if bucket_state is not None:
        prior_b = bucket_state.filter(F.col("epoch") != epoch_id).select(
            F.col("doc_id").alias("b_id"), "band_id", "band_hash"
        )
        corpus_cand = (
            buckets.select(F.col("doc_id").alias("a_id"), "band_id", "band_hash")
            .join(prior_b, ["band_id", "band_hash"])
            .select("a_id", "b_id")
            .distinct()
            .withColumn("__from_corpus", F.lit(True))
        )
        cand = cand.unionByName(corpus_cand)
    cand = cand.localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)

    # verification corpus: the batch docs plus ONLY the candidate partner
    # docs pulled from prior epochs — bounded by |candidates|
    all_docs = docs
    corpus_state = _read_epochs(spark, corpus_dir)
    if corpus_state is not None:
        partner_ids = cand.filter("__from_corpus").select(
            F.col("b_id").alias("doc_id")
        ).distinct()
        partners = (
            corpus_state.filter(F.col("epoch") != epoch_id)
            .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
            .join(partner_ids, "doc_id")
        )
        all_docs = docs.unionByName(partners)

    verified = verify_candidate_pairs(
        all_docs,
        cand.select("a_id", "b_id").distinct(),
        "doc_id",
        "text",
        n=shingle_n,
        threshold=threshold,
    ).join(cand, ["a_id", "b_id"])
    # drop rule: a corpus match kills the new doc; an in-batch match kills
    # the larger id (chain-min — the pair generator enforces a_id < b_id)
    dropped = (
        verified.filter("__from_corpus").select(F.col("a_id").alias("doc_id"))
        .unionByName(
            verified.filter("NOT __from_corpus").select(
                F.col("b_id").alias("doc_id")
            )
        )
        .distinct()
    )
    kept = survivors.join(
        dropped.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    kept_buckets = buckets.join(
        kept.select(F.col(id_col).alias("doc_id")), "doc_id"
    )
    return kept, kept_buckets


def start_dedup_ingest(
    doc_stream: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_dir: str | None = None,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 2,
    available_now: bool = True,
    clean_fn=None,
):
    """Run the ingestion query (``availableNow`` drains what's present and
    stops — the nightly-ingest trigger; otherwise continuous).  The LSH
    knobs and the pre-dedup ``clean_fn`` quality gate pass through to
    :func:`dedup_ingest_writer`."""
    q = doc_stream.writeStream.foreachBatch(
        dedup_ingest_writer(
            corpus_dir, index_dir, id_col, text_col,
            bucket_dir=bucket_dir, jaccard_threshold=jaccard_threshold,
            shingle_n=shingle_n, num_hashes=num_hashes,
            rows_per_band=rows_per_band, clean_fn=clean_fn,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()


def read_ingested_corpus(spark, corpus_dir: str) -> DataFrame:
    """The deduplicated corpus across all ingested epochs (partition
    column ``epoch`` records provenance; negative epochs are compacted
    base generations — see :func:`compact_ingest_state`)."""
    return spark.read.parquet(corpus_dir)


def _fs_for(spark, path: str):
    """Hadoop FileSystem for ``path`` — compaction must work on whatever
    filesystem the state dirs live on, not just the driver's local disk."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def compact_ingest_state(
    spark,
    state_dir: str,
    upto: int | None = None,
    target_rows_per_file: int = 5_000_000,
) -> dict:
    """Fold committed epoch partitions into one base generation —
    the small-file compaction for the per-epoch-overwrite layout
    (VERDICT r4 #5): a long-running stream accumulates one small parquet
    dir per epoch, and every probe in :func:`dedup_ingest_writer` reads
    thousands of partitions at 100 TB scale.

    Protocol (safe under the writer's at-least-once replay):

    - eligible = every partition with ``epoch <= upto``, where ``upto``
      defaults to ``max(epoch) - 1`` — **the newest epoch is never
      compacted**: a crash-recovery replay re-runs exactly that epoch
      with self-exclusion (``epoch != epoch_id``) + per-epoch overwrite,
      which only stays idempotent while its rows live in its OWN
      partition.  Compacted epochs are strictly older than the
      checkpoint's next epoch and can never be replayed.
    - base generations are NEGATIVE epochs (``epoch=-1``, ``epoch=-2``,
      …): always included by every ``epoch != epoch_id`` probe (real
      epoch ids are ≥ 0) and invisible to the max-epoch collision guard.
      Each compaction folds the prior base(s) plus newly eligible
      epochs into the next generation.
    - crash-safety by ORDER, not transactions: the new base is written
      to a temp dir and atomically renamed into the state dir BEFORE any
      source partition is deleted.  Every crash window therefore leaves
      AT MOST duplicate membership (rows present in both the new base
      and a not-yet-deleted source), which every downstream probe
      tolerates — the exact stage anti-joins on fingerprint, the bucket
      stage distincts candidates — and the next compaction run heals.

    Returns ``{"compacted_epochs": [...], "base_epoch": g, "rows": n}``
    (no-op: empty list).  Run per state dir (corpus / index / buckets);
    the dirs are independent membership state, so compacting them at
    different times is safe.
    """
    df = _read_epochs(spark, state_dir)
    if df is None:
        return {"compacted_epochs": [], "base_epoch": None, "rows": 0}
    epochs = [
        r["epoch"] for r in df.select("epoch").distinct().collect()
    ]
    mx = max((e for e in epochs if e >= 0), default=None)
    if mx is None:
        return {"compacted_epochs": [], "base_epoch": None, "rows": 0}
    if upto is None:
        upto = mx - 1
    if upto >= mx:
        raise ValueError(
            f"upto={upto} would compact the newest epoch {mx}, which must "
            "stay replayable under the at-least-once contract; use "
            f"upto <= {mx - 1}"
        )
    eligible = sorted(e for e in epochs if e <= upto)
    if not eligible or all(e < 0 for e in eligible):
        return {"compacted_epochs": [], "base_epoch": None, "rows": 0}
    new_base = min((e for e in epochs if e < 0), default=0) - 1

    rows_df = df.filter(F.col("epoch") <= upto).drop("epoch")
    n = rows_df.count()
    nfiles = max(1, -(-n // target_rows_per_file))
    tmp = f"{state_dir.rstrip('/')}.compact-tmp-{os.getpid()}"
    rows_df.coalesce(nfiles).write.mode("overwrite").parquet(tmp)

    jvm, fs, _ = _fs_for(spark, state_dir)
    dst = jvm.org.apache.hadoop.fs.Path(
        os.path.join(state_dir, f"epoch={new_base}")
    )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dst):
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise ValueError(
            f"compaction rename into {dst} failed (concurrent compaction?)"
        )
    # only AFTER the base is fully installed: drop the folded sources
    for e in eligible:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(state_dir, f"epoch={e}")
            ),
            True,
        )
    return {"compacted_epochs": eligible, "base_epoch": new_base, "rows": n}


def _atomic_epoch_rewrite(spark, state_dir: str, ep, keep_df: DataFrame) -> None:
    """Crash-safe replacement of one epoch partition (ADVICE r5: a
    plain ``mode('overwrite')`` deletes the live files before the
    rewrite lands, so a mid-rewrite crash loses the partition's OTHER
    rows).  The filtered rows are written to a hidden temp dir first
    (Spark file listings skip dot-prefixed paths, so a crashed leftover
    can never be misread as data), then the live dir is moved aside and
    the temp dir renamed in — at every crash point a complete copy of
    the surviving rows exists on disk:

    - crash before the first rename: live dir untouched, stray temp
      dir is inert;
    - crash between the renames: the full partition still exists under
      its ``.forget-old`` name — nothing was deleted;
      :func:`_recover_epoch_rewrites` (run on entry to
      :func:`forget_docs`) detects the orphan and renames it back;
    - crash after the second rename: only the obsolete old copy
      lingers, harmlessly hidden, and the recovery sweep deletes it.

    Renames go through the Hadoop FileSystem API (same as
    :func:`compact_ingest_state`), so the contract holds on HDFS-like
    stores, not just the local posix path used in tests."""
    token = f"{ep}-{os.getpid()}"
    tmp = os.path.join(state_dir, f".forget-tmp-{token}")
    old = os.path.join(state_dir, f".forget-old-{token}")
    live = os.path.join(state_dir, f"epoch={ep}")
    # the write reads the live dir and lands in tmp — no self-overwrite,
    # so no eager materialization is needed before it
    keep_df.write.mode("overwrite").parquet(tmp)
    jvm, fs, _ = _fs_for(spark, state_dir)
    path = jvm.org.apache.hadoop.fs.Path
    if not fs.rename(path(live), path(old)):
        fs.delete(path(tmp), True)
        raise ValueError(f"could not move {live} aside for rewrite")
    if not fs.rename(path(tmp), path(live)):
        fs.rename(path(old), path(live))  # restore; nothing lost
        raise ValueError(f"could not install rewritten partition {live}")
    fs.delete(path(old), True)


def _recover_epoch_rewrites(spark, state_dir: str) -> dict:
    """Heal the crash windows of :func:`_atomic_epoch_rewrite` (ADVICE
    r6: the between-renames window left an orphaned ``.forget-old-*``
    dir that no code path restored — the live ``epoch=N`` partition was
    simply absent and readers silently skipped it, i.e. data appeared
    erased).  For every leftover ``.forget-old-<ep>-<pid>``:

    - live ``epoch=<ep>`` missing → the crash hit between the renames;
      rename the complete old copy back into place (nothing was lost);
    - live dir present → the crash hit after the install (or this is a
      concurrent run's stray); the hidden copy is obsolete — delete it.

    Stray ``.forget-tmp-*`` dirs (crash before the first rename) are
    always inert garbage and are deleted.  Returns counts for tests:
    ``{"restored": [...], "purged_old": n, "purged_tmp": n}``."""
    jvm, fs, _ = _fs_for(spark, state_dir)
    path = jvm.org.apache.hadoop.fs.Path
    root = path(state_dir)
    if not fs.exists(root):
        return {"restored": [], "purged_old": 0, "purged_tmp": 0}
    restored, purged_old, purged_tmp = [], 0, 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(".forget-tmp-"):
            fs.delete(st.getPath(), True)
            purged_tmp += 1
        elif name.startswith(".forget-old-"):
            ep = name[len(".forget-old-"):].rsplit("-", 1)[0]
            live = path(os.path.join(state_dir, f"epoch={ep}"))
            if fs.exists(live):
                fs.delete(st.getPath(), True)
                purged_old += 1
            elif fs.rename(st.getPath(), live):
                restored.append(ep)
            else:
                raise ValueError(
                    f"orphaned rewrite {name} in {state_dir} could not be "
                    f"restored to {live}; manual intervention required"
                )
    return {
        "restored": restored,
        "purged_old": purged_old,
        "purged_tmp": purged_tmp,
    }


def forget_docs(
    spark,
    corpus_dir: str,
    index_dir: str,
    ids,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_dir: str | None = None,
    allow_newest_epoch: bool = False,
) -> int:
    """Right-to-erasure deletion across the ingest state — the takedown
    path a production corpus must have: removing a document removes it
    from the corpus, AND from the fingerprint index (so identical
    content offered later is accepted again instead of being
    deduplicated against a ghost), AND from the LSH bucket index (so it
    stops killing near-duplicates of itself).

    Design points, each the answer to a real failure mode:

    - **Filter-based removal, never rebuild**: index partitions are
      purged by anti-joining the forgotten docs' own fingerprints, and
      bucket partitions by anti-joining their doc ids — so the function
      needs no knowledge of the writer's LSH geometry, and it works even
      when ``compact_ingest_state`` has folded the three state dirs into
      DIFFERENT epoch layouts (each dir's affected partitions are
      located independently).
    - **Corpus written LAST**: the affected-epoch scan keys off the
      corpus, so a crash mid-way leaves the doc still visible there and
      a re-run heals every index; the reverse order would strand ghost
      fingerprints no re-run could find.
    - **Newest-epoch guard**: the newest positive epoch is still
      replayable under the writer's at-least-once contract — a
      checkpoint replay would resurrect anything erased from it.  Like
      ``compact_ingest_state``, this refuses to touch it unless the
      caller asserts the stream is stopped (``allow_newest_epoch``).
    - Ids keep the corpus id column's own type (string ids are ingested
      happily by the writer and must be erasable too).

    Returns the number of corpus rows removed."""
    ids = sorted(set(ids))
    if not ids:
        return 0
    # heal any orphaned rewrite from a previous crashed run FIRST, so the
    # epoch scan below sees the complete pre-crash state
    for d in (corpus_dir, index_dir, bucket_dir):
        if d is not None:
            _recover_epoch_rewrites(spark, d)
    corpus = _read_epochs(spark, corpus_dir)
    if corpus is None:
        return 0
    id_type = corpus.schema[id_col].dataType.simpleString()
    id_df = F.broadcast(
        spark.createDataFrame([(i,) for i in ids], f"{id_col} {id_type}")
    )
    hits = corpus.join(id_df, id_col).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)
    removed = hits.count()
    if removed == 0:
        return 0
    affected = sorted(r["epoch"] for r in hits.select("epoch").distinct().collect())
    newest = max(
        (r["epoch"] for r in corpus.select("epoch").distinct().collect()),
        default=None,
    )
    if not allow_newest_epoch and newest is not None and newest in affected:
        raise ValueError(
            f"doc(s) live in the newest epoch {newest}, which a streaming "
            "checkpoint replay could rewrite and silently resurrect them; "
            "stop the ingest query first, then pass allow_newest_epoch=True"
        )
    # the fingerprints to purge — derived from the docs being removed,
    # independent of where compaction moved them in the index layout
    fps = F.broadcast(
        hits.select(
            F.coalesce(
                F.md5(F.col(text_col).cast("binary")), F.lit("__null__")
            ).alias("fingerprint")
        ).distinct()
    ).localCheckpoint(eager=True, storageLevel=CHECKPOINT_LEVEL)

    def _purge(state_dir: str, state: DataFrame, key_cols: list, victims):
        """Rewrite only the partitions of ``state_dir`` holding victim
        rows, filtering those rows out.  Keyed on the state's OWN epoch
        layout."""
        marked = state.join(victims, key_cols, "left_semi")
        eps = sorted(
            r["epoch"] for r in marked.select("epoch").distinct().collect()
        )
        for ep in eps:
            keep = (
                state.filter(F.col("epoch") == ep)
                .join(victims, key_cols, "left_anti")
                .drop("epoch")
            )
            _atomic_epoch_rewrite(spark, state_dir, ep, keep)

    index = _read_epochs(spark, index_dir)
    if index is not None:
        _purge(index_dir, index, ["fingerprint"], fps)
    if bucket_dir is not None:
        buckets = _read_epochs(spark, bucket_dir)
        if buckets is not None:
            # bucket rows always carry the writer's canonical "doc_id"
            # column, whatever the caller's id column is named
            _purge(
                bucket_dir,
                buckets,
                ["doc_id"],
                F.broadcast(
                    hits.select(F.col(id_col).alias("doc_id")).distinct()
                ),
            )
    # corpus last: while the doc is still visible here, a re-run after
    # any crash above re-locates and re-purges every index
    for ep in affected:
        keep = (
            corpus.filter(F.col("epoch") == ep)
            .join(id_df, id_col, "left_anti")
            .drop("epoch")
        )
        _atomic_epoch_rewrite(spark, corpus_dir, ep, keep)
    return removed

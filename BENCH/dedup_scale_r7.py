"""Round-7 evidence (VERDICT r6 Next #6): the banding claims of the dedup
pair generators, measured on AMPLIFIED corpora instead of plan shape
alone — candidate counts must grow ~linearly in docs (never
quadratically) and walls must follow.

Amplification: replica k of the sf0.1 documents table carries
``translate(text, 'aeiou', <rotation_k>)`` — a deterministic wholesale
token remap, so each replica keeps the corpus's internal dup structure
(near-dup density constant) while replicas are content-disjoint. Corpus
grows Kx; a banded (never all-pairs) generator's candidates then grow
~Kx, while an all-pairs plan would grow ~K^2 x.

Usage: python BENCH/dedup_scale_r7.py  — prints one JSON line per scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALES = (1, 4, 16)
ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
        "eiuao", "iuaoe", "uaoei", "aoeiu", "oeiua",
        "aiueo", "iueoa", "ueoai", "eoaiu", "oaiue", "uoiea"]


def amplified_docs(spark, k):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    parts = []
    for r in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + r * n * 10).alias("doc_id"),
                F.col("lang"),
                F.translate(F.col("text"), "aeiou", ROTS[r % len(ROTS)]).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True)


def main() -> None:
    from pyspark.sql import functions as F

    from mysql_time_machine_spark.session import get_spark

    spark = get_spark(
        "dedup-scale-r7", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    from mysql_time_machine_spark.operators.dedup import (
        _band_structs,
        _identical_text_groups,
        _minhash_from_shm,
        _simhash_chunks,
        minhash_lsh_pairs,
        simhash,
        simhash_pairs,
        word_shingles,
    )

    for k in SCALES:
        docs = amplified_docs(spark, k)
        n_docs = docs.count()
        out = {"scale": k, "n_docs": n_docs}

        # --- minhash: banded candidate count (the join the LSH replaces
        # all-pairs with) + full-operator wall
        reps, _members = _identical_text_groups(docs, "text", "doc_id", ())
        sig = reps.select(
            "id",
            _minhash_from_shm(
                F.transform(word_shingles("text", 3), lambda s: F.md5(s)), 16
            ).alias("mh"),
        )
        banded = sig.select(
            "id", F.explode(_band_structs(F.col("mh"), 16, 4)).alias("bb")
        ).select("id", "bb.band", "bb.bucket")
        out["minhash_banded_candidates"] = (
            banded.groupBy("band", "bucket")
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
            .head()[0]
        )
        t0 = time.time()
        out["minhash_pairs"] = (
            minhash_lsh_pairs(docs, 16, 4, 0.2).agg(F.count("*")).head()[0]
        )
        out["minhash_wall_s"] = round(time.time() - t0, 3)

        # --- simhash: pigeonhole-banded candidate count at rep level +
        # full-operator wall
        base = docs.select("lang", simhash("text").alias("h")).distinct()
        chunked = base.select(
            "lang",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("ci"), cv.alias("cv"))
                        for i, cv in enumerate(_simhash_chunks(F.col("h"), 5))
                    ]
                )
            ).alias("c"),
        ).select("lang", "c.ci", "c.cv")
        out["simhash_banded_candidates"] = (
            chunked.groupBy("lang", "ci", "cv")
            .count()
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
            .head()[0]
        )
        t0 = time.time()
        out["simhash_pairs"] = simhash_pairs(docs, 4).agg(F.count("*")).head()[0]
        out["simhash_wall_s"] = round(time.time() - t0, 3)

        # --- streaming minhash over 3 ordered drops (index growth + lookup)
        from mysql_time_machine_spark.operators.dedup import minhash_dedup_stream

        root = tempfile.mkdtemp(prefix=f"mtm_dsc_{k}x_")
        drops = os.path.join(root, "drops")
        os.makedirs(drops)
        b1, b2 = docs.approxQuantile("doc_id", [1 / 3, 2 / 3], 0.0)
        for i, (lo, hi) in enumerate([(None, b1), (b1, b2), (b2, None)]):
            part = docs
            if lo is not None:
                part = part.where(F.col("doc_id") > lo)
            if hi is not None:
                part = part.where(F.col("doc_id") <= hi)
            staged = os.path.join(root, f"_s{i}")
            part.coalesce(1).write.mode("overwrite").parquet(staged)
            src = [f for f in os.listdir(staged) if f.endswith(".parquet")][0]
            shutil.move(
                os.path.join(staged, src), os.path.join(drops, f"drop-{i:03d}.parquet")
            )
            time.sleep(0.05)
        t0 = time.time()
        verdicts = minhash_dedup_stream(
            spark, drops, sink_dir=os.path.join(root, "sink"),
            threshold=0.2, max_files_per_trigger=1, n_buckets=64,
        )
        out["stream_minhash_verdicts"] = verdicts.count()
        out["stream_minhash_wall_s"] = round(time.time() - t0, 3)
        shutil.rmtree(root, ignore_errors=True)

        print(json.dumps(out))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

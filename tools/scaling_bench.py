"""Replica-blown scaling measurement for the corpus operators.

Usage: python tools/scaling_bench.py ROWS [ROWS ...] [--ops op,op,...]

Blows up sf0.1's 5,000 documents to each target row count by word-level
replica suffixing — every non-stopword w in replica r becomes "w_r" —
so each replica keeps the base corpus's internal near-dup structure
while cross-replica shingle Jaccard is ~0 (a shared shingle needs 3+
consecutive stopwords). Candidate-pair counts therefore scale LINEARLY
with rows on a healthy implementation; a quadratic blowup is
immediately visible. Stopwords stay unsuffixed so Gopher's stop-hit
gate sees realistic text. Prints one JSON line per (rows, op) with wall
seconds and output rows. This is the script behind SCALING.md's
"Measured scaling" table.

Note: bm25 rows are meaningful from 25k up — at the 5k base the
synthetic corpus puts every term in >half the docs, so idf floors to 0
(Lucene semantics) and every query returns empty.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg2kinesis_spark.io import load_table
from pg2kinesis_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
BASE_ROWS = 5000


def build_corpus(spark, rows: int) -> str:
    """Materialize the replica-blown corpus to parquet (pay once) and
    return its path. Distinct doc_ids; word-suffixed distinct texts."""
    path = os.path.join(tempfile.gettempdir(), f"scaling_docs_{rows}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from pg2kinesis_spark.functions.text import STOPWORDS

    stop_lit = ", ".join(f"'{w}'" for w in STOPWORDS)
    reps = (rows + BASE_ROWS - 1) // BASE_ROWS
    base = load_table(spark, BASE_SF, "documents").select("doc_id", "text")
    blown = (
        base.crossJoin(spark.range(reps).select(F.col("id").alias("r")))
        .select(
            (F.col("doc_id") + F.col("r") * BASE_ROWS).alias("doc_id"),
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), "
                    f"w -> IF(w IN ({stop_lit}), w, concat(w, '_', r)))"
                ),
                " ",
            ).alias("text"),
        )
        .filter(F.col("doc_id") < rows)
    )
    # partition count scales with rows (~25k docs/file): a fixed 32-file
    # layout makes per-task memory GROW with corpus size — at 5M rows the
    # 156k-doc tasks GC-thrash the executor to death. Bounded tasks are
    # exactly what spark.sql.files.maxPartitionBytes gives a real cluster;
    # the writer must not defeat it with giant row groups.
    blown.repartition(max(32, rows // 25_000)).write.mode("overwrite").parquet(path)
    return path


def op_gopher(spark, docs):
    from pg2kinesis_spark.functions.repetition import gopher_filter

    return gopher_filter(docs)


def op_substr(spark, docs):
    from pg2kinesis_spark.functions.substr_dedup import dedup_substrings

    return dedup_substrings(docs, k=20)


def op_lsh(spark, docs):
    from pg2kinesis_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(docs, n=3, k=16, bands=4)


def op_bm25(spark, docs):
    from pg2kinesis_spark.functions.search import bm25_topk

    qs = {"q1": "spark_0 window_0 merge_0", "q2": "customer_0 order_0 data_0"}
    return bm25_topk(spark, docs, qs, k=10)


def op_curate(spark, docs):
    from pg2kinesis_spark.functions.curate import curate_corpus

    return curate_corpus(docs, min_quality=0.2, near_dup_jaccard=0.6)


def op_bpe(spark, docs):
    from pg2kinesis_spark.functions.bpe import bpe_token_counts, learn_bpe

    model = learn_bpe(docs.limit(5000), num_merges=500)
    return bpe_token_counts(docs, model)


def op_dsir(spark, docs):
    from pg2kinesis_spark.functions.dsir import dsir_select, fit_dsir_logratios

    lr = fit_dsir_logratios(docs.limit(200), docs)
    return dsir_select(docs, lr, n=1000)


def op_urls(spark, docs):
    # deterministic URL column synthesized from doc_id: ~rows/500
    # domains, 10% duplicate paths — the bench_urls shape at scale
    from pg2kinesis_spark.functions import urls as U

    with_urls = docs.select("doc_id").withColumn(
        "url",
        F.expr(
            "concat('https://www.d', pmod(hash(doc_id), greatest(cast(500 as int), 1)),"
            " '.example', pmod(hash(doc_id, 7), 100), '.com/p/',"
            " cast(doc_id div 10 as string), '?utm_source=s&id=', doc_id)"
        ),
    )
    gated = U.domain_blocklist_filter(
        with_urls, [f"d{i}.example{i % 100}.com" for i in range(50)]
    )
    return U.domain_cap(U.url_dedup(gated), k=100)


def op_semdedup(spark, docs):
    # embeddings synthesized row-locally from the text hash: 16-dim
    # integer-derived vectors, deterministic, cluster count scaled so
    # mean cluster size stays ~250 — the paper's K-scales-with-N rule
    from pg2kinesis_spark.functions.semdedup import semdedup

    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), i -> "
            "cast(pmod(xxhash64(text, i), 1000) as float) / 1000.0)"
        ).alias("embedding"),
    )
    n = docs.count()
    # hierarchical (coarse-quantizer) assignment: O(N·√K·nprobe) — the
    # scale path; the flat O(N·K) wall is recorded in SCALING.md (100k
    # rows / K=400: 205 s flat). K follows N/250, capped at 512.
    return semdedup(
        emb, dim=16, eps=0.05,
        n_clusters=max(8, min(512, n // 250)),
        hierarchical=True,
    )


def build_media_corpus(spark, rows: int) -> str:
    """Materialize a replica-blown MEDIA corpus: 32x32 smooth RGB
    images synthesized deterministically from the media_id. Ids pair
    up — (2k, 2k+1) share a base image, the even one ships as PNG, the
    odd one as a brightness-shifted quality-85 JPEG — so every pair is
    a planted cross-format near-dup and the TRUE near-dup count grows
    LINEARLY with rows (the same health probe as the text ladder)."""
    path = os.path.join(tempfile.gettempdir(), f"scaling_media_{rows}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import numpy as np
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA

    def kernel(batches):
        from pg2kinesis_spark.functions import codecs

        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                seed = int(mid) // 2
                rng = np.random.RandomState(seed % (2**31))
                base = rng.randint(0, 256, (8, 8, 3)).astype(float)
                img = np.clip(np.kron(base, np.ones((4, 4, 1))), 0, 255).astype(np.uint8)
                if mid % 2 == 0:
                    data, mime = codecs.encode_png(img), "image/png"
                else:
                    shifted = np.clip(img.astype(np.int16) + 3, 0, 255).astype(np.uint8)
                    data, mime = codecs.encode_jpeg(shifted, quality=85), "image/jpeg"
                out.append((int(mid), data, {"mime": mime, "bytes_hint": len(data),
                                             "source_uri": f"mem://{mid}"}))
            yield pd.DataFrame(out, columns=["media_id", "content", "meta"])

    (
        spark.range(rows)
        .repartition(max(32, rows // 25_000))
        .mapInPandas(kernel, MEDIA_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def build_audio_corpus(spark, rows: int) -> str:
    """Replica-blown AUDIO corpus: 0.5 s mono 8 kHz tracks synthesized
    deterministically from the media_id. Ids pair up — (2k, 2k+1)
    share a base PCM track, the even one ships as WAV, the odd one as
    FLAC (lossless, so the pair is fingerprint-IDENTICAL) — true pair
    count = rows/2 exactly, growing linearly."""
    path = os.path.join(tempfile.gettempdir(), f"scaling_audio_{rows}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import numpy as np
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA

    def kernel(batches):
        from pg2kinesis_spark.functions import codecs

        n = 4000
        t = np.arange(n)
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                seed = int(mid) // 2
                rng = np.random.RandomState(seed % (2**31))
                freq = 80 + (seed % 400)
                env = np.repeat(rng.uniform(0.2, 1.0, 80), n // 80)
                pcm = (
                    6000 * env * np.sin(2 * np.pi * freq * t / 8000)
                    + rng.randint(-500, 500, n)
                ).astype(np.int64)[:, None]
                if mid % 2 == 0:
                    data, mime = codecs.encode_wav(pcm.astype(np.int16), 8000), "audio/wav"
                else:
                    data, mime = codecs.encode_flac(pcm, 8000), "audio/flac"
                out.append((int(mid), data, {"mime": mime, "bytes_hint": len(data),
                                             "source_uri": f"mem://{mid}"}))
            yield pd.DataFrame(out, columns=["media_id", "content", "meta"])

    (
        spark.range(rows)
        .repartition(max(32, rows // 25_000))
        .mapInPandas(kernel, MEDIA_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def op_audio_features(spark, media):
    # full PCM decode: WAV frombuffer + FLAC rice/predictor walk
    from pg2kinesis_spark.functions.multimodal import extract_audio_features

    return extract_audio_features(media)


def op_audio_afp(spark, media):
    from pg2kinesis_spark.functions.multimodal import audio_fingerprint

    return audio_fingerprint(media)


def op_audio_analysis(spark, media):
    # full PCM decode + K-weighted loudness + framed rFFT features —
    # the audio tier's deepest per-file kernel (round 9)
    from pg2kinesis_spark.functions.multimodal import extract_audio_analysis

    return extract_audio_analysis(media)


def op_audio_curate(spark, media):
    # the full composition: gates (duration + silence) -> exact dedup
    # -> fingerprint near-dup; clean count = rows/2 exactly (every
    # WAV/FLAC twin collapses, nothing else gates on this corpus)
    from pg2kinesis_spark.functions.multimodal import curate_media

    clean, _rejected = curate_media(
        media, kind="audio", min_duration_ms=100, max_silence_ratio=0.9,
        max_hamming=0,
    )
    return clean


def op_audio_neardup(spark, media):
    # decode -> energy-envelope fingerprint -> segment-equi-join pair
    # search; planted WAV/FLAC twins are hamming-0, so output = rows/2
    from pg2kinesis_spark.functions.multimodal import media_near_dup_pairs

    return media_near_dup_pairs(media, signature="audio", max_hamming=0)


def build_av_corpus(spark, rows: int) -> str:
    """Landmark-match ladder corpus (n29's operator, round 12): ids
    pair up — (2k, 2k+1) share a 1 s 8 kHz note sequence, the odd one
    prepended with seed-dependent silence — so the offset-consensus
    vote should recover ~one pair per id pair (~rows/2) with a
    nonzero dt, which aligned-window fingerprints cannot see.
    Measured (SCALING.md round 12): recall against the planted rows/2
    is governed by hot_hash_cap — the default 64 keeps ~89% at the
    100k rung, 256 recovers 100% at ~7x the wall."""
    path = os.path.join(tempfile.gettempdir(), f"scaling_av_{rows}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import numpy as np
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA

    def kernel(batches):
        from pg2kinesis_spark.functions import codecs

        n = 8000
        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                seed = int(mid) // 2
                rng = np.random.RandomState(seed % (2**31))
                # continuous frequencies: cross-pair landmark-hash
                # collisions vanish, so matches ~= the planted rows/2
                freqs = 200.0 + 1200.0 * rng.random_sample(8)
                t = np.arange(1000)
                pcm = np.concatenate(
                    [8000 * np.sin(2 * np.pi * f * t / 8000) for f in freqs]
                )
                if mid % 2:
                    pad = (seed % 4 + 1) * 512
                    pcm = np.concatenate([np.zeros(pad), pcm])
                pcm = pcm[:n].astype(np.int16)[:, None]
                data = codecs.encode_wav(pcm, 8000)
                out.append((int(mid), data,
                            {"mime": "audio/wav", "bytes_hint": len(data),
                             "source_uri": f"mem://{mid}"}))
            yield pd.DataFrame(out, columns=["media_id", "content", "meta"])

    (
        spark.range(rows)
        .repartition(max(32, rows // 25_000))
        .mapInPandas(kernel, MEDIA_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def build_clip_corpus(spark, rows: int) -> str:
    """Scene-cut ladder corpus: 12-frame 24x16 Y4M clips with one
    hard luma cut planted at a seed-dependent frame — the per-clip
    kernel is map-only Arrow work, so wall should scale linearly."""
    path = os.path.join(tempfile.gettempdir(), f"scaling_clip_{rows}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    import numpy as np
    import pandas as pd

    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA

    def kernel(batches):
        from pg2kinesis_spark.functions import codecs

        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                seed = int(mid)
                cut = 3 + seed % 6
                a = np.full((16, 24, 3), 30 + seed % 60, dtype=np.uint8)
                b = np.full((16, 24, 3), 200 - seed % 60, dtype=np.uint8)
                frames = [a] * cut + [b] * (12 - cut)
                data = codecs.encode_y4m(frames)
                out.append((int(mid), data,
                            {"mime": "video/x-y4m", "bytes_hint": len(data),
                             "source_uri": f"mem://{mid}"}))
            yield pd.DataFrame(out, columns=["media_id", "content", "meta"])

    (
        spark.range(rows)
        # clips are ~14 KB each (30x the audio rows): keep per-task
        # pandas batches small or the single local JVM eats 32 big
        # Arrow buffers at once (the 100k crash on the first attempt)
        .repartition(max(64, rows // 2_000))
        .mapInPandas(kernel, MEDIA_SCHEMA)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def op_av_landmark(spark, media):
    # constellation hashes -> (hash, id, t1) shuffle with the hot-hash
    # cap -> offset-consensus votes; planted pairs vote >100 on this
    # corpus, pure-tone spurious agreements <20, so min_votes=25
    # separates them cleanly — output tracks the planted rows/2 with
    # recall set by hot_hash_cap (see SCALING.md round 12)
    from pg2kinesis_spark.functions.multimodal import audio_landmark_match

    return audio_landmark_match(media, min_votes=25)


def op_av_scenecuts(spark, media):
    # map-only per-clip Arrow kernel; output = 11 transitions per clip
    from pg2kinesis_spark.functions.multimodal import video_scene_cuts

    return video_scene_cuts(media)


def op_media_features(spark, media):
    # full pixel decode (PNG + progressive-capable JPEG path) + luma
    from pg2kinesis_spark.functions.multimodal import extract_image_features

    return extract_image_features(media)


def op_media_dhash(spark, media):
    from pg2kinesis_spark.functions.multimodal import media_dhash

    return media_dhash(media)


def op_media_neardup(spark, media):
    # decode -> dHash -> segment-equi-join pair search; output should be
    # ~rows/2 planted pairs (linear), never all-pairs
    from pg2kinesis_spark.functions.multimodal import media_near_dup_pairs

    return media_near_dup_pairs(media, signature="dhash", max_hamming=6)


def run_ingest(spark, docs_path: str, rows: int) -> tuple[float, int]:
    """Streaming-ingest micro-batch at ladder scale: seed the indexes
    with 3/5 of the corpus untimed, then time ONE process_batch over a
    mix of never-seen docs + planted exact/near duplicates of the
    seeded batch (bench.py's ingest_batch shape, scaled). Returns
    (timed wall, input docs in the timed batch) — the marginal
    docs/sec at deployment batch sizes, where the ~5 s fixed per-batch
    cost amortizes away."""
    import shutil

    from pg2kinesis_spark.streaming.corpus_ingest import CorpusIngest

    docs = spark.read.parquet(docs_path)
    b0 = docs.filter("doc_id % 5 < 3")
    b1 = (
        docs.filter("doc_id % 5 = 3")
        .selectExpr("doc_id + 100000000 AS doc_id", "text")
        .unionByName(
            docs.filter("doc_id % 10 = 0").selectExpr(
                "doc_id + 200000000 AS doc_id", "text"
            )
        )
        .unionByName(
            docs.filter("doc_id % 10 = 1").selectExpr(
                "doc_id + 300000000 AS doc_id",
                "concat(text, ' tail_edit') AS text",
            )
        )
    )
    out = os.path.join(tempfile.gettempdir(), f"scaling_ingest_{rows}")
    shutil.rmtree(out, ignore_errors=True)
    try:
        ing = CorpusIngest(out, near_dup_jaccard=0.6, bloom_bits=1 << 25)
        ing.process_batch(b0, 0)
        n = b1.count()
        t0 = time.perf_counter()
        ing.process_batch(b1, 1)
        return time.perf_counter() - t0, n
    finally:
        shutil.rmtree(out, ignore_errors=True)


OPS = {
    "gopher": op_gopher,
    "substr": op_substr,
    "lsh": op_lsh,
    "bm25": op_bm25,
    "curate": op_curate,
    "bpe": op_bpe,
    "dsir": op_dsir,
    "urls": op_urls,
    "semdedup": op_semdedup,
    "media_features": op_media_features,
    "media_dhash": op_media_dhash,
    "media_neardup": op_media_neardup,
    "audio_features": op_audio_features,
    "audio_afp": op_audio_afp,
    "audio_neardup": op_audio_neardup,
    "audio_analysis": op_audio_analysis,
    "audio_curate": op_audio_curate,
    "av_landmark": op_av_landmark,
    "av_scenecuts": op_av_scenecuts,
}


def main() -> None:
    rows_list = [int(a) for a in sys.argv[1:] if not a.startswith("--")]
    ops = ["gopher", "substr", "lsh", "bm25"]
    for a in sys.argv[1:]:
        if a.startswith("--ops"):
            ops = a.split("=", 1)[1].split(",")
    spark = get_spark("scaling_bench")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for rows in rows_list:
        text_ops = [
            op for op in ops
            if not op.startswith(("media_", "audio_", "av_"))
        ]
        media_ops = [op for op in ops if op.startswith("media_")]
        audio_ops = [op for op in ops if op.startswith("audio_")]
        docs = spark.read.parquet(build_corpus(spark, rows)) if text_ops else None
        media = (
            spark.read.parquet(build_media_corpus(spark, rows)) if media_ops else None
        )
        audio = (
            spark.read.parquet(build_audio_corpus(spark, rows)) if audio_ops else None
        )
        av = (
            spark.read.parquet(build_av_corpus(spark, rows))
            if "av_landmark" in ops else None
        )
        clips = (
            spark.read.parquet(build_clip_corpus(spark, rows))
            if "av_scenecuts" in ops else None
        )
        for op in ops:
            if op == "ingest":
                wall, n = run_ingest(spark, build_corpus(spark, rows), rows)
                print(
                    json.dumps(
                        {
                            "rows": rows,
                            "op": op,
                            "wall_s": round(wall, 2),
                            "out_rows": n,
                            "docs_per_sec": round(n / wall, 1),
                        }
                    ),
                    flush=True,
                )
                continue
            if op.startswith("media_"):
                src = media
            elif op.startswith("audio_"):
                src = audio
            elif op == "av_landmark":
                src = av
            elif op == "av_scenecuts":
                src = clips
            else:
                src = docs
            t0 = time.perf_counter()
            n = OPS[op](spark, src).count()
            wall = round(time.perf_counter() - t0, 2)
            print(
                json.dumps({"rows": rows, "op": op, "wall_s": wall, "out_rows": n}),
                flush=True,
            )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Audio-dedup scale bench: the end-to-end audio_dedup_pipeline
(exact md5 tier -> fused-decode log-mel embeddings -> banded cosine
candidates -> star-contraction components -> keepers) over a
synthetic clip corpus with planted duplicate structure:

  - i % 10 == 0 -> one byte-identical copy (exact tier)
  - i % 10 == 1 -> one 16 kHz flac/mulaw re-encode of the 48 kHz
                   original (embedding tier: invisible to byte hashes)
  - otherwise   -> unique recording

Content is per-recording seeded noise shaped by a random 16-band EQ
profile (measured cross-recording cosine <= 0.9602 over 1500
recordings; re-encode pairs >= 0.9993) — the two-tone synth recipe's
1800-value f0 space produces thousands of GENUINE spectral
collisions at corpus scale, which is a fixture property, not a
pipeline defect.

Reports per-stage wall time, throughput (ids/sec end-to-end incl.
every decode), and planted-structure recovery (expected vs recovered
exact pairs / embedding pairs / keepers).

Usage: python tools/audio_dedup_bench.py [--rows 20000] [--cores 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def synth_clips(spark, n_rows: int):
    def gen(batches):
        import zlib

        import numpy as np
        import pandas as pd

        from data_validator_spark.audio import codecs
        from data_validator_spark.audio.resample import resample

        def shaped_noise(cid: str, sr: int, n: int) -> np.ndarray:
            seed = zlib.crc32(cid.encode()) & 0xFFFFFFFF
            rng = np.random.default_rng(seed)
            x = rng.standard_normal(n)
            spec = np.fft.rfft(x)
            freqs = np.fft.rfftfreq(n, 1.0 / sr)
            edges = np.geomspace(50, 4000, 17)
            gains = rng.uniform(0.05, 1.0, 16)
            g = np.ones_like(freqs) * 0.02
            for b in range(16):
                m = (freqs >= edges[b]) & (freqs < edges[b + 1])
                g[m] = gains[b]
            y = np.fft.irfft(spec * g, n)
            y = 0.4 * y / (np.abs(y).max() + 1e-9)
            return y.astype(np.float32)

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                cid = f"adb-{i:07d}"
                sr = 48000
                n = 9600 + (i * 131) % 9600  # 200-400 ms
                pcm = shaped_noise(cid, sr, n)
                base = codecs.encode("pcm16", pcm, sr)
                rows.append((f"{cid}-a", "pcm16", base))
                if i % 10 == 0:
                    rows.append((f"{cid}-b", "pcm16", base))
                elif i % 10 == 1:
                    y = np.clip(resample(pcm, sr, 16000), -1, 1)
                    codec = "flac" if (i // 10) % 2 == 0 else "mulaw"
                    rows.append(
                        (f"{cid}-c", codec, codecs.encode(codec, y, 16000))
                    )
            yield pd.DataFrame(rows, columns=["clip_id", "codec", "bytes"])

    return spark.range(0, n_rows, numPartitions=64).mapInPandas(
        gen, "clip_id string, codec string, bytes binary"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.992)
    args = ap.parse_args()

    from data_validator_spark.session import build_session

    spark = build_session(
        cores=args.cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import tempfile

    tmp = tempfile.mkdtemp(prefix="audio_dedup_bench_")
    t0 = time.monotonic()
    synth_clips(spark, args.rows).write.mode("overwrite").parquet(tmp)
    clips = spark.read.parquet(tmp)
    n_ids = clips.count()
    t_synth = time.monotonic() - t0

    from data_validator_spark.operators.audio_dedup import (
        audio_dedup_pipeline,
    )

    t1 = time.monotonic()
    res = audio_dedup_pipeline(clips, threshold=args.threshold)
    n_exact = res.exact_pairs.count()
    t_exact = time.monotonic() - t1
    t2 = time.monotonic()
    n_emb_pairs = res.embedding_pairs.count()
    t_pairs = time.monotonic() - t2
    t3 = time.monotonic()
    n_keepers = res.keepers.filter("is_keeper").count()
    t_components = time.monotonic() - t3
    total = time.monotonic() - t1

    exp_exact = (args.rows + 9) // 10
    exp_emb = (args.rows + 8) // 10
    out = {
        "rows": args.rows,
        "n_ids": n_ids,
        "synth_sec": round(t_synth, 1),
        "exact_tier_sec": round(t_exact, 1),
        "embed_and_pairs_sec": round(t_pairs, 1),
        "components_sec": round(t_components, 1),
        "total_sec": round(total, 1),
        "ids_per_sec": round(n_ids / total, 1),
        "exact_pairs": {"expected": exp_exact, "got": n_exact},
        "embedding_pairs": {"expected": exp_emb, "got": n_emb_pairs},
        "keepers": {"expected": args.rows, "got": n_keepers},
        "recovered_all": n_exact == exp_exact
        and n_emb_pairs >= exp_emb
        and n_keepers <= args.rows,
    }
    res.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate sf1-scale documents/embeddings for the heavy-query scaling
measurement (BENCH_SF1.md).

The driver ships sf{0.001,0.01,0.1} only; the 100 TB claims need one
measured decade above the bench SF, so this reproduces the driver tables'
measured shape at 10x sf0.1 (deterministic, seed 4242 - same
DISTRIBUTIONS, not the same rows):

  documents  sf0.1: 5,000 rows  -> sf1: 50,000
    - text: 10..100 uniform words over the same 30-word vocabulary
    - 5% of docs are near-dup copies of an earlier doc with a few words
      replaced by the rare 'dup' token (measured: 250/5000 docs carry it)
    - source = src{doc_id % 20} (20 sources at EVERY sf -> per-source
      blocks grow 10x: exactly the block-quadratic tail the measurement
      is for), lang ~ {en:0.41, de/es/fr/zh: ~0.15 each}
  embeddings sf0.1: 2,000 rows -> sf1: 8,000 (the driver's own 0.01->0.1
    step scaled embeddings 4x), 64-dim unit-normalized gaussians,
    label ~ uniform(10) (measured: no cluster structure)

Other tables are symlinked from sf0.1 (no heavy query touches them).

Usage: python3 dev/gen_sf1.py [outdir=/tmp/graft_sf1]
"""
import os, sys, random, math

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
SRC = "/root/testdata/sf0.1"
N_DOCS, N_EMB, DIM = 50_000, 8_000, 64

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(rng):
    docs = []  # (doc_id, text, lang, source, n_chars)
    texts = []
    for i in range(N_DOCS):
        if i > 100 and rng.random() < 0.05:
            # near-dup: copy an earlier doc, swap a few words for 'dup'
            base = texts[rng.randrange(len(texts))].split(" ")
            for _ in range(max(1, len(base) // 20)):
                base[rng.randrange(len(base))] = "dup"
            words = base
        else:
            words = [VOCAB[rng.randrange(len(VOCAB))]
                     for _ in range(rng.randint(10, 100))]
        text = " ".join(words)
        texts.append(text)
        lang = rng.choices(LANGS, weights=LANG_W, k=1)[0]
        docs.append((i, text, lang, f"src{i % 20}", len(text)))
    return docs


def gen_embeddings(rng):
    rows = []
    for i in range(N_EMB):
        v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        rows.append((i, [x / n for x in v], rng.randrange(10)))
    return rows


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(4242)

    docs = gen_documents(rng)
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array([d[3] for d in docs], pa.string()),
        "n_chars": pa.array([d[4] for d in docs], pa.int64()),
    }), f"{OUT}/documents.parquet")

    emb = gen_embeddings(rng)
    pq.write_table(pa.table({
        "vec_id": pa.array([e[0] for e in emb], pa.int64()),
        "embedding": pa.array([e[1] for e in emb], pa.list_(pa.float32())),
        "label": pa.array([e[2] for e in emb], pa.int32()),
    }), f"{OUT}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"wrote {OUT}: documents={len(docs)} embeddings={len(emb)}")


if __name__ == "__main__":
    main()

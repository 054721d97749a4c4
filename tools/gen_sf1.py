"""Regenerate the synthetic sf1 probe set (r14 recipe, SCALE.md):
10 key-offset replicas of sf0.1 (offset 10**7 * i keeps FKs valid);
documents additionally get a per-replica deterministic word shuffle so
replica texts are not exact dups (unigram stats preserved, n-gram
structure broken). Dimension tables (nation, region) copy once."""
import pandas as pd
import os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
R = 10
OFF = 10**7

KEYS = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}

os.makedirs(DST, exist_ok=True)
for t in ["nation", "region"]:
    pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(f"{DST}/{t}.parquet", index=False)


def shuffle_words(text: str, i: int) -> str:
    # deterministic: rotate the word list by i positions (replica index
    # is the only variation source — seed-free)
    w = text.split()
    if len(w) < 2:
        return text
    k = (i * 7) % len(w)
    return " ".join(w[k:] + w[:k])


for t, keys in KEYS.items():
    base = pd.read_parquet(f"{SRC}/{t}.parquet")
    reps = []
    for i in range(R):
        r = base.copy()
        for k in keys:
            r[k] = r[k] + OFF * i
        if t == "documents" and i > 0:
            r["text"] = [shuffle_words(s, i) for s in r["text"]]
        reps.append(r)
    out = pd.concat(reps, ignore_index=True)
    out.to_parquet(f"{DST}/{t}.parquet", index=False)
    print(t, len(out))
print("done")

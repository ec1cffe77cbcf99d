#!/usr/bin/env python3
"""Generate the .npz import fixture with REAL numpy (np.savez_compressed),
in the reference engine's exact save layout (pythonvectordb.py:572-582):
version, dimension, vectors (int8, compacted), vector_ids, id_to_index
(pickled), metadata (pickled), vector_count, deleted_count.

Also emits the reference kernel's expected search results for a fixed
query (cosine_similarity_int8 semantics, pythonvectordb.py:25-67:
dequantize /127, float32 accumulation, divide by both norms) so the
Scala import spec is a genuine cross-engine integrity check.

Run: python3 tools/make_npz_fixture.py   (regenerates src/test/resources/)
"""
import json
import numpy as np

rng = np.random.RandomState(20260812)
N, DIM = 40, 16

# reference add_vectors pipeline: float32 -> normalize -> quantize int8
# (normalize_batch pythonvectordb.py:70-99; quantize_batch :102-127)
raw = rng.randn(N, DIM).astype(np.float32)
norms = np.linalg.norm(raw, axis=1, keepdims=True)
normed = np.where(norms < 1e-10, 0.0, raw / norms).astype(np.float32)
q = normed * 127.0
q = np.clip(q, -128, 127)
vectors = q.astype(np.int8)  # trunc toward zero, matches np.int8 cast

ids = np.array([f"vec_{i}" for i in range(N)])
np.savez_compressed(
    "src/test/resources/ref_store.npz",
    version="1.0.0",
    dimension=DIM,
    vectors=vectors,
    vector_ids=ids,
    id_to_index={f"vec_{i}": i for i in range(N)},
    metadata={f"vec_{i}": {"g": str(i % 3)} for i in range(N)},
    vector_count=N,
    deleted_count=0,
)

# reference search for a fixed query (pythonvectordb.py:25-67, float32 acc)
query = rng.randn(DIM).astype(np.float32)
qnorm = np.sqrt(np.sum(query.astype(np.float32) ** 2, dtype=np.float32))
deq = vectors.astype(np.float32) / np.float32(127.0)
dots = (deq * query).sum(axis=1, dtype=np.float32)
vnorms = np.sqrt((deq * deq).sum(axis=1, dtype=np.float32))
scores = np.where(vnorms < 1e-10, 0.0, dots / (qnorm * vnorms))
order = np.argsort(-scores, kind="stable")[:10]
json.dump(
    {
        "query": [float(x) for x in query],
        "expected": [
            {"id": f"vec_{int(i)}", "score": float(scores[i])} for i in order
        ],
    },
    open("src/test/resources/ref_store_search.json", "w"),
    indent=1,
)
print("wrote ref_store.npz +", len(order), "expected hits")

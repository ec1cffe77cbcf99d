#!/usr/bin/env python3
"""Validate a VectorStore.exportNpz file with REAL numpy, replicating the
reference engine's load steps (pythonvectordb.py:600-630): np.load with
allow_pickle, extract every entry exactly as load() does (including
.item() on the pickled dicts), and run its validation checks.

Usage: python3 tools/check_npz_export.py <file.npz>
"""
import sys
import numpy as np

path = sys.argv[1]
data = np.load(path, allow_pickle=True)  # pythonvectordb.py:600

# extraction, exactly as pythonvectordb.py:608-615
version = str(data["version"])
dimension = int(data["dimension"])
vectors = data["vectors"]
vector_ids = data["vector_ids"].tolist()
id_to_index = data["id_to_index"].item()
metadata = data["metadata"].item()
vector_count = int(data["vector_count"])
deleted_count = int(data["deleted_count"])

# validation, exactly as pythonvectordb.py:617-630
assert isinstance(dimension, int) and dimension > 0, f"Invalid dimension: {dimension}"
assert isinstance(vector_count, int) and vector_count >= 0
assert vectors.shape[0] == vector_count, "Vector count mismatch"
assert vectors.shape[1] == dimension, "Vector dimension mismatch"
assert len(vector_ids) == vector_count, "Vector IDs count mismatch"

# shape/type checks beyond load(): dtype + index + metadata consistency
assert vectors.dtype == np.int8, vectors.dtype
assert isinstance(id_to_index, dict) and len(id_to_index) == vector_count
assert all(id_to_index[v] == i for i, v in enumerate(vector_ids)), "index misaligned"
assert isinstance(metadata, dict)
for k, v in metadata.items():
    assert k in id_to_index and isinstance(v, dict)

print(f"OK version={version} dim={dimension} count={vector_count} "
      f"deleted={deleted_count} meta_entries={len(metadata)}")

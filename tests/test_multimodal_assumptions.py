"""Pin the documents-table assumption mm_audio_window_energy's oracle
relies on: the Spark path reads raw UTF-8 payload BYTES (np.frombuffer)
while the DuckDB oracle iterates CHARACTERS (ascii(substring(text,i,1))).
The two only agree while every document is pure ASCII (1 char == 1 byte,
codepoint == byte value). True for the current generator; if testdata
ever grows non-ASCII text this test fails loudly instead of the oracle
hash silently diverging.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq


def _docs_text(sf_dir):
    path = os.path.join(sf_dir, "documents.parquet")
    src = path if os.path.exists(path) else glob.glob(path + "/*.parquet")[0]
    return pq.read_table(src, columns=["text"]).column("text").to_pylist()


def test_documents_text_is_pure_ascii_at_every_sf():
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        bad = [
            i
            for i, t in enumerate(_docs_text(sf_dir))
            if t is not None and not t.isascii()
        ]
        assert not bad, (
            f"{sf}: non-ASCII text in documents rows {bad[:5]} — "
            "mm_audio_window_energy's byte-vs-char oracle equivalence "
            "no longer holds; fold over octets in the oracle instead"
        )

"""CLI end-to-end: ``python -m map_reduce_framework_spark wc ...`` over
real files produces the reference's mr-out tree with correct counts."""

from __future__ import annotations

import glob
import os
import re
from collections import Counter

from map_reduce_framework_spark.__main__ import main


def test_cli_wc_end_to_end(spark, tmp_path):
    texts = {
        "a.txt": "the quick brown fox the lazy dog the end\n",
        "b.txt": "quick quick dog-pound; 42 dogs\n",
    }
    for fname, body in texts.items():
        (tmp_path / fname).write_text(body)
    out = str(tmp_path / "out")
    main(["wc", *(str(tmp_path / f) for f in texts), "-o", out, "--n-reduce", "3"])

    want = Counter(
        w
        for body in texts.values()
        for run in re.findall(r"[^\W\d_]+", body, re.UNICODE)
        for w in ([run] if run.isalpha() else [])  # letter-only runs
    )
    # non-alpha runs re-split into alpha segments (compat._letter_runs)
    for body in texts.values():
        for run in re.findall(r"[^\W\d_]+", body, re.UNICODE):
            if not run.isalpha():
                for seg in re.findall(r"[^\W\d_]+", run):
                    if seg.isalpha():
                        want[seg] += 1

    got = Counter()
    files = sorted(glob.glob(os.path.join(out, "mr-out-*")))
    assert len(files) == 3  # --n-reduce pins the reducer/file count
    for p in files:
        prev_key = None
        for line in open(p, encoding="utf-8"):
            k, _, v = line.rstrip("\n").partition(" ")
            got[k] += int(v)
            assert prev_key is None or k >= prev_key  # key-sorted (A7)
            prev_key = k
    assert got == want

"""``python -m linkgraph`` job entry (north rule: runs via ray job submit)."""

import json
import os

import numpy as np
import pyarrow.parquet as pq

from linkgraph import synth
from linkgraph.__main__ import main


def test_cli_cc_writes_labels(tmp_path, capsys):
    edges, expected = synth.make_planted_graph(300, 3, 4, seed=41)
    inp = str(tmp_path / "edges.parquet")
    out = str(tmp_path / "labels")
    pq.write_table(edges, inp)
    rc = main(["cc", "--edges", inp, "--output", out, "--num-partitions", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["components"] == 3
    assert os.listdir(out)
    got = pq.read_table(out)
    assert got.num_rows == len(np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    ))

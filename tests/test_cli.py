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


def test_cli_cc_from_mtx(tmp_path, capsys):
    """Reference-parity input path: MTX file → CC labels parquet."""
    from linkgraph.sources import write_mtx

    edges, expected = synth.make_planted_graph(200, 2, 4, seed=13)
    mtx = str(tmp_path / "g.mtx")
    write_mtx(
        mtx,
        edges["src"].to_numpy(),
        edges["dst"].to_numpy(),
        num_vertices=200,
    )
    out = str(tmp_path / "labels")
    rc = main(["cc", "--mtx", mtx, "--output", out, "--num-partitions", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["components"] == 2
    got = pq.read_table(out)
    lab = dict(zip(got["vertex"].to_numpy(), got["label"].to_numpy()))
    for v, l in lab.items():
        assert l == expected[v]


def test_cli_bfs_and_sssp(tmp_path, capsys):
    import pyarrow as pa

    # chain 0-1-2-3 with weights 2,3,4
    t = pa.table(
        {
            "src": np.array([0, 1, 2], dtype=np.int64),
            "dst": np.array([1, 2, 3], dtype=np.int64),
            "w": np.array([2, 3, 4], dtype=np.int64),
        }
    )
    inp = str(tmp_path / "wedges.parquet")
    pq.write_table(t, inp)

    out_b = str(tmp_path / "bfs_out")
    assert main(["bfs", "--edges", inp, "--source", "0",
                 "--output", out_b, "--num-partitions", "2"]) == 0
    got = pq.read_table(out_b).to_pandas().set_index("vertex")["dist"].to_dict()
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    summ = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summ["cmd"] == "bfs" and summ["supersteps"] == 4

    out_s = str(tmp_path / "sssp_out")
    assert main(["sssp", "--edges", inp, "--source", "0",
                 "--output", out_s, "--num-partitions", "2"]) == 0
    got = pq.read_table(out_s).to_pandas().set_index("vertex")["dist"].to_dict()
    assert got == {0: 0, 1: 2, 2: 5, 3: 9}


def test_cli_decontaminate(tmp_path, capsys):
    import pyarrow as pa

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [bench, "unrelated words that do not overlap at all here ok"],
                    pa.string(),
                ),
            }
        ),
        str(tmp_path / "train.parquet"),
    )
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([9], pa.int64()),
             "text": pa.array([bench], pa.string())}
        ),
        str(tmp_path / "eval.parquet"),
    )
    out = str(tmp_path / "flagged")
    rc = main([
        "decontaminate",
        "--train", str(tmp_path / "train.parquet"),
        "--eval", str(tmp_path / "eval.parquet"),
        "--output", out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["flagged"] == 1
    got = pq.read_table(out)
    assert got.to_pydict()["doc_id"] == [1]


def test_cli_ppr_and_hits(tmp_path, capsys):
    edges, _ = synth.make_planted_graph(200, 2, 4, seed=19)
    inp = str(tmp_path / "edges.parquet")
    pq.write_table(edges, inp)

    out = str(tmp_path / "ppr")
    rc = main([
        "ppr", "--edges", inp, "--seeds", "0,5", "--max-iters", "10",
        "--tol", "0", "--output", out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["iterations"] == 10 and summary["num_seeds"] == 2
    got = pq.read_table(out)
    assert {"vertex", "rank"} <= set(got.column_names)
    # RWR conserves mass
    assert abs(sum(got["rank"].to_pylist()) - 1.0) < 1e-9

    out2 = str(tmp_path / "hits")
    rc = main(["hits", "--edges", inp, "--max-iters", "3", "--output", out2])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["iterations"] == 3
    got2 = pq.read_table(out2)
    assert {"vertex", "hub", "authority"} <= set(got2.column_names)
    assert got2.num_rows == summary["num_vertices"]


def test_cli_walks(tmp_path, capsys):
    edges, _ = synth.make_planted_graph(100, 2, 4, seed=23)
    inp = str(tmp_path / "edges.parquet")
    pq.write_table(edges, inp)
    out = str(tmp_path / "walks")
    rc = main([
        "walks", "--edges", inp, "--starts", "0,50", "--length", "4",
        "--walks-per-start", "2", "--output", out,
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 2 * 2 * 5  # 2 starts x 2 walks x steps 0..4
    got = pq.read_table(out)
    assert set(got.column_names) == {"start", "widx", "step", "vertex"}

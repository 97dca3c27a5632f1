"""prepare CLI smoke tests (train-cases + submaps subcommands)."""
import os

import numpy as np

from feat3dnet_tpu.cli.prepare import main as prepare_main


def test_train_cases_subcommand(tmp_path):
    ds = tmp_path / "seqA"
    ds.mkdir()
    with open(ds / "metadata.txt", "w") as f:
        f.write("Idx\tDataset\tStartIdx\tEndIdx\tNumPts\tX\tY\tZ\n")
        for i, x in enumerate([0.0, 5.0, 30.0]):
            f.write(f"{i}\tseqA\t\t\t100\t{x}\t150.0\t0.0\n")
    prepare_main(["train-cases", "--train_folder", str(tmp_path),
                  "--datasets", "seqA"])
    from feat3dnet_tpu.data.datagenerator import parse_metadata
    meta = parse_metadata(str(tmp_path / "train.txt"))
    assert len(meta) == 3
    assert meta[0].positives == {0, 1}
    assert meta[0].nonnegatives == {2}


def test_submaps_subcommand(tmp_path, rng):
    from tests.test_dataprep import _write_submap
    os.makedirs(tmp_path / "seq")
    paths = []
    for i in range(2):
        pth = str(tmp_path / "seq" / f"r{i}.bin")
        _write_submap(pth, rng)
        paths.append(pth)
    out = str(tmp_path / "out")
    prepare_main(["submaps", "--out", out] + paths)
    assert os.path.exists(os.path.join(out, "seq", "0.bin"))
    assert os.path.exists(os.path.join(out, "seq", "metadata.txt"))

"""Data-prep tests: normals vs analytic planes, voxel averaging, train-case
thresholds, KITTI scan selection/transforms, oxford SE3/slerp, submap parse."""
import os

import numpy as np
import pytest

from feat3dnet_tpu.dataprep import estimate_normals, generate_train_cases, voxel_downsample
from feat3dnet_tpu.dataprep.kitti import (
    make_pair_groundtruths, pose_cam_to_velo, rotmat_to_quat_wxyz, select_scans_every,
)
from feat3dnet_tpu.dataprep.oxford import (
    accumulate_scans, interpolate_poses, process_cloud, se3_from_components,
    segment_trajectory,
)
from feat3dnet_tpu.dataprep.submap import convert_submaps, read_submap


def test_normals_on_plane(rng):
    # points on z=0 plane -> normals ±z, flipped away from viewpoint above
    pts = np.concatenate([rng.rand(200, 2) * 10, np.zeros((200, 1))], axis=1)
    normals, curvature, _ = estimate_normals(pts, k=9, viewpoint=(0, 0, 0))
    assert np.all(np.abs(normals[:, 2]) > 0.99)
    assert np.all(curvature < 1e-6)
    # viewpoint at origin (on the plane): dir_largest flips by z-component
    # toward the viewpoint; all normals consistent up to the flip rule
    nz = normals[:, 2]
    assert np.all(np.abs(np.abs(nz) - 1.0) < 1e-2)


def test_normals_on_sphere(rng):
    pts = rng.randn(500, 3)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 5.0
    normals, _, _ = estimate_normals(pts, k=9, viewpoint=(0, 0, 0))
    radial = np.abs(np.sum(normals * pts / 5.0, axis=1))
    assert np.mean(radial > 0.9) > 0.95  # normals ~radial
    # flipped toward origin viewpoint -> pointing inward
    inward = np.sum(normals * pts, axis=1) < 0
    assert np.mean(inward) > 0.95


def test_voxel_downsample():
    pts = np.array([[0.01, 0.01, 0.01], [0.05, 0.05, 0.05],   # same voxel
                    [1.05, 0.0, 0.0]])                         # another voxel
    out, attr = voxel_downsample(pts, grid=0.2, attributes=np.eye(3))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [0.03, 0.03, 0.03], atol=1e-6)
    np.testing.assert_allclose(attr[0], [0.5, 0.5, 0.0], atol=1e-6)


def test_generate_train_cases(tmp_path):
    # four clouds on a line at 0, 5, 30, 200 (y=200 for last -> also test
    # region exclusion with default bounds y<100 keeps all since y=200>100..)
    positions = np.array([[0, 150, 0], [5, 150, 0], [30, 150, 0], [200, 150, 0]], float)
    out = tmp_path / "train.txt"
    n = generate_train_cases([f"{i}.bin" for i in range(4)], positions, str(out))
    assert n == 4
    from feat3dnet_tpu.data.datagenerator import parse_metadata
    meta = parse_metadata(str(out))
    # cloud0: positives {0,1} (d<11 incl self), nonneg {2} (30<=50), not 3
    assert meta[0].positives == {0, 1}
    assert meta[0].nonnegatives == {2}


def test_generate_train_cases_test_region(tmp_path):
    positions = np.array([[0, 50, 0], [0, 150, 0]], float)  # y=50 inside test region
    out = tmp_path / "train.txt"
    n = generate_train_cases(["a.bin", "b.bin"], positions, str(out))
    assert n == 1  # y=50 excluded (test region y<100)


def test_select_scans_every():
    positions = np.stack([np.arange(0, 100, 2.0), np.zeros(50), np.zeros(50)], 1)
    scans = select_scans_every(positions, meters=10.0)
    # every ~10m at 2m spacing -> indices 0,5,10,... (jump to last <=10m)
    assert scans[0] == 0
    assert np.all(np.diff(positions[scans, 0]) >= 10.0 - 2.0)
    assert len(scans) >= 9


def test_pose_cam_to_velo_roundtrip(rng):
    from tests.test_eval import _random_rigid
    r, t = _random_rigid(rng)
    tr = np.eye(4); tr[:3, :3] = r; tr[:3, 3] = t
    pose = np.eye(4); pose[:3, 3] = [1, 2, 3]
    out = pose_cam_to_velo(pose[:3], tr)
    # Tr^-1 P Tr is a similarity transform: identity rotation preserved
    np.testing.assert_allclose(out[:3, :3], np.eye(3), atol=1e-5)


def test_rotmat_quat_roundtrip(rng):
    from feat3dnet_tpu.dataprep.oxford import rotmat_from_quat
    from tests.test_eval import _random_rigid
    for _ in range(10):
        r, _ = _random_rigid(rng)
        q = rotmat_to_quat_wxyz(r)
        np.testing.assert_allclose(rotmat_from_quat(q), r, atol=1e-5)


def test_make_pair_groundtruths_transform(rng):
    # two poses 5m apart -> one pair; groundtruth maps frame2 pts to frame1
    poses = np.zeros((2, 3, 4))
    poses[0, :, :3] = np.eye(3)
    poses[1, :, :3] = np.eye(3)
    poses[1, :, 3] = [5, 0, 0]
    tr = np.eye(4)
    pairs = make_pair_groundtruths(poses, np.array([0, 1]), tr, max_dist=10.0)
    assert len(pairs) == 1
    a, b, t, q = pairs[0]
    np.testing.assert_allclose(t, [5, 0, 0], atol=1e-10)
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-10)


def test_se3_and_interpolation():
    m = se3_from_components([1, 2, 3, 0, 0, np.pi / 2])
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    ts = np.array([0e6, 1e6], float)
    poses = np.array([[0, 0, 0, 0, 0, 0], [10, 0, 0, 0, 0, np.pi / 2]], float)
    interp, vel = interpolate_poses(ts, poses, np.array([0.5e6]))
    np.testing.assert_allclose(interp[0][:3, 3], [5, 0, 0], atol=1e-9)
    # halfway rotation = 45 degrees about z
    ang = np.arctan2(interp[0][1, 0], interp[0][0, 0])
    np.testing.assert_allclose(ang, np.pi / 4, atol=1e-6)
    np.testing.assert_allclose(vel[0], [10, 0, 0], atol=1e-6)  # 10 m/s


def test_accumulate_and_segment(rng):
    # straight drive along x; each planar scan is a wall slice
    n_frames = 100
    poses = []
    scans = []
    for i in range(n_frames):
        m = np.eye(4)
        m[:3, 3] = [i * 1.0, 0, 0]
        poses.append(m)
        scans.append(rng.rand(20, 2).astype(np.float64))
    cloud = accumulate_scans(scans, poses, np.eye(4))
    assert cloud.shape == (2000, 3)
    windows = segment_trajectory(np.stack([p[:3, 3] for p in poses]),
                                 accumulate_distance=60, meters_per_cloud=10)
    assert len(windows) == 4  # 99m of travel -> starts at 0,10,20,30
    assert windows[0][0] == 0 and abs(windows[0][1] - 60) <= 1


def test_process_cloud(rng):
    cloud = rng.randn(3000, 3) * 10.0
    rows, mu = process_cloud(cloud)
    assert rows.shape[1] == 6
    np.testing.assert_allclose(mu, cloud.mean(0), atol=1e-9)
    assert np.all(np.sum(rows[:, :3] ** 2, axis=1) < 30.0 ** 2 + 1.0)
    norms = np.linalg.norm(rows[:, 3:], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def _write_submap(path, rng, num_points=50, num_features=3, world=(1.0, 2.0, 3.0)):
    header = np.zeros((), np.dtype("i8,i4,i8,?,f8,f8,f8,f8,f8,f8,f8,f8,f8,f8,f8,f8,i4,i4"))
    header["f0"] = 123456
    header["f14"], header["f15"], header["f16"] = 0, 0, 0
    # world xyz at field indices 10,11,12 -> names f10..f12... field f4..f15 are
    # the 12 doubles; vals[10..12] = f10, f11, f12? list(header) index 10 = 'f10'.
    header["f10"], header["f11"], header["f12"] = world
    header["f16"] = num_features
    header["f17"] = num_points
    pts = rng.rand(num_points, 3).astype(np.float32)
    with open(path, "wb") as f:
        header.tofile(f)
        for _ in range(num_features):
            np.zeros(3 + 32, np.float32).tofile(f)
        extra = np.zeros((), np.dtype("f4,f4,f4,u1,u1,u1,i8"))
        for i in range(num_points):
            pts[i].tofile(f)
            extra.tofile(f)
    return pts


def test_read_submap(tmp_path, rng):
    pts = _write_submap(str(tmp_path / "s" / "0.bin.tmp"), rng) if False else None
    os.makedirs(tmp_path / "seq", exist_ok=True)
    path = str(tmp_path / "seq" / "raw0.bin")
    pts = _write_submap(path, rng)
    got, world, header = read_submap(path)
    np.testing.assert_allclose(got, pts, atol=1e-7)
    assert world == (1.0, 2.0, 3.0)
    assert header["num_points"] == 50


def test_convert_submaps(tmp_path, rng):
    os.makedirs(tmp_path / "seq")
    paths = []
    for i in range(3):
        p = str(tmp_path / "seq" / f"raw{i}.bin")
        _write_submap(p, rng, world=(float(i), 0.0, 0.0))
        paths.append(p)
    out_dir = str(tmp_path / "out")
    outs = convert_submaps(paths, out_dir)
    assert len(outs) == 3
    data = np.fromfile(outs[0], np.float32).reshape(-1, 6)
    assert data.shape == (50, 6)
    assert np.all(data[:, 3:] == 0)  # zero normals by default
    meta = open(os.path.join(out_dir, "seq", "metadata.txt")).read().splitlines()
    assert meta[0].startswith("Idx")
    assert len(meta) == 4

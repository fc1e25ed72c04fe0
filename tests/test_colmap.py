"""COLMAP dataset loading + SfM initialization (beyond-reference capability;
gstpu/data/colmap.py).  Fixtures are synthesized in the standard COLMAP
binary (and text) model formats, so the parsers are tested against the
format spec, not against themselves."""

import os
import struct

import numpy as np
import pytest

from gstpu.config import GSConfig
from gstpu.data.colmap import (ColmapDataset, is_colmap_dataset,
                               qvec_to_rotmat, read_cameras_text,
                               read_images_text, read_points3d_text)
from gstpu.models.gaussians import SH_C0, init_model_from_points

W, H = 64, 64
FX, FY = 100.0, 120.0
N_IMAGES = 9
N_POINTS = 20


def _write_model(root, binary=True):
    """Write a tiny COLMAP capture: one PINHOLE camera, N_IMAGES poses on a
    ring looking at the origin, N_POINTS colored points."""
    import imageio.v2 as imageio

    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True, exist_ok=True)
    imgdir = root / "images"
    imgdir.mkdir(exist_ok=True)

    rng = np.random.default_rng(3)
    poses = []
    for i in range(N_IMAGES):
        # camera at distance 4, straight-on along -z (identity rotation),
        # jittered so poses differ
        c = np.array([0.05 * i, -0.03 * i, -4.0 - 0.1 * i])
        R = np.eye(3)
        t = -R @ c
        q = np.array([1.0, 0.0, 0.0, 0.0])  # (w, x, y, z) identity
        name = f"r_{i:02d}.png"
        poses.append((i + 1, q, t, name))
        imageio.imwrite(imgdir / name,
                        rng.integers(0, 255, (H, W, 3)).astype(np.uint8))
    xyz = rng.uniform(-1, 1, (N_POINTS, 3)).astype(np.float64)
    rgb = rng.integers(0, 255, (N_POINTS, 3)).astype(np.uint8)

    if binary:
        with open(sparse / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 1, W, H))  # id=1, PINHOLE
            f.write(struct.pack("<4d", FX, FY, W / 2, H / 2))
        with open(sparse / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", len(poses)))
            for img_id, q, t, name in poses:
                f.write(struct.pack("<i", img_id))
                f.write(struct.pack("<4d", *q))
                f.write(struct.pack("<3d", *t))
                f.write(struct.pack("<i", 1))
                f.write(name.encode() + b"\x00")
                f.write(struct.pack("<Q", 2))  # two 2D points, skipped
                f.write(struct.pack("<2dq2dq", 1.0, 2.0, -1, 3.0, 4.0, 0))
        with open(sparse / "points3D.bin", "wb") as f:
            f.write(struct.pack("<Q", N_POINTS))
            for p in range(N_POINTS):
                f.write(struct.pack("<Q3d3Bd", p + 1, *xyz[p], *rgb[p], 0.5))
                f.write(struct.pack("<Q", 1))       # track of length 1
                f.write(struct.pack("<ii", 1, 0))
    else:
        with open(sparse / "cameras.txt", "w") as f:
            f.write("# cameras\n")
            f.write(f"1 PINHOLE {W} {H} {FX} {FY} {W / 2} {H / 2}\n")
        with open(sparse / "images.txt", "w") as f:
            f.write("# images\n")
            for img_id, q, t, name in poses:
                f.write(f"{img_id} {q[0]} {q[1]} {q[2]} {q[3]} "
                        f"{t[0]} {t[1]} {t[2]} 1 {name}\n")
                # COLMAP writes an EMPTY 2D-points line for images without
                # triangulated tracks — the parser must not lose the
                # two-line pairing (every 3rd image here exercises that)
                f.write("\n" if img_id % 3 == 0 else "1.0 2.0 -1\n")
        with open(sparse / "points3D.txt", "w") as f:
            f.write("# points\n")
            for p in range(N_POINTS):
                f.write(f"{p + 1} {xyz[p, 0]} {xyz[p, 1]} {xyz[p, 2]} "
                        f"{rgb[p, 0]} {rgb[p, 1]} {rgb[p, 2]} 0.5 1 0\n")
    return xyz.astype(np.float32), rgb.astype(np.float32) / 255.0


def test_colmap_binary_parse_and_split(tmp_path):
    xyz, rgb = _write_model(tmp_path, binary=True)
    assert is_colmap_dataset(str(tmp_path))

    train = ColmapDataset(str(tmp_path), "train")
    test = ColmapDataset(str(tmp_path), "test")
    # official llffhold=8 protocol: images 0 and 8 (of 9) are test
    assert len(test) == 2 and len(train) == N_IMAGES - 2
    assert train.width == W and train.height == H

    cam = train.camera(0)  # first train image = r_01
    assert cam["tan_fovx"] == pytest.approx(W / (2 * FX))
    assert cam["tan_fovy"] == pytest.approx(H / (2 * FY))
    c_expected = np.array([0.05, -0.03, -4.1], np.float32)
    np.testing.assert_allclose(cam["camera_center"], c_expected, atol=1e-5)
    # world_to_camera (transposed storage): [c, 1] @ w2c_T = origin
    p = np.array([*c_expected, 1.0], np.float32) @ cam["world_to_camera"]
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    img = train.image(0)
    assert img.shape == (H, W, 3) and img.dtype == np.float32

    px, prgb = train.points3d()
    np.testing.assert_allclose(px, xyz, atol=1e-6)
    np.testing.assert_allclose(prgb, rgb, atol=1e-6)


def test_colmap_text_matches_binary(tmp_path):
    b = tmp_path / "bin"
    t = tmp_path / "txt"
    b.mkdir()
    t.mkdir()
    _write_model(b, binary=True)
    _write_model(t, binary=False)
    db = ColmapDataset(str(b), "train")
    dt = ColmapDataset(str(t), "train")
    assert len(db) == len(dt)
    for i in range(len(db)):
        np.testing.assert_allclose(db.camera(i)["full_proj_matrix"],
                                   dt.camera(i)["full_proj_matrix"],
                                   atol=1e-6)
    np.testing.assert_allclose(db.points3d()[0], dt.points3d()[0], atol=1e-5)
    # text readers directly too (module API surface)
    sparse = str(t / "sparse" / "0")
    assert len(read_cameras_text(os.path.join(sparse, "cameras.txt"))) == 1
    assert len(read_images_text(os.path.join(sparse, "images.txt"))) \
        == N_IMAGES
    assert read_points3d_text(
        os.path.join(sparse, "points3D.txt"))[0].shape == (N_POINTS, 3)


def _make_mixed_focal_rig(tmp_path):
    """Rewrite the fixture so image r_01 uses a second camera with 2x fx."""
    sparse = tmp_path / "sparse" / "0"
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<4d", FX, FY, W / 2, H / 2))
        f.write(struct.pack("<iiQQ", 2, 1, W, H))        # same size,
        f.write(struct.pack("<4d", FX * 2, FY, W / 2, H / 2))  # other focal
    with open(sparse / "images.bin", "rb") as f:
        raw = bytearray(f.read())
    # repoint image 2's camera_id (after id + 7 doubles + name) to camera 2
    off = 8 + 4 + 56
    off += 4 + len(b"r_00.png") + 1 + 8 + 2 * 24   # past image 1's record
    off += 4 + 56                                   # into image 2's cam_id
    assert struct.unpack_from("<i", raw, off)[0] == 1
    struct.pack_into("<i", raw, off, 2)
    with open(sparse / "images.bin", "wb") as f:
        f.write(raw)


def test_colmap_mixed_focals_per_view_intrinsics(tmp_path):
    """Multi-camera rigs: views with differing focals load with per-view
    tan_fov records (intrinsics ride as traced render operands, so the
    trainer supports them with one compiled step)."""
    _write_model(tmp_path, binary=True)
    _make_mixed_focal_rig(tmp_path)
    ds = ColmapDataset(str(tmp_path), "train", holdout=0)
    # image r_01 (sorted position 1) uses camera 2 (fx doubled)
    assert ds.camera(1)["tan_fovx"] == pytest.approx(W / (2 * FX * 2))
    assert ds.camera(0)["tan_fovx"] == pytest.approx(W / (2 * FX))
    assert ds.camera(1)["tan_fovy"] == ds.camera(0)["tan_fovy"]


def test_colmap_fisheye_models_parse(tmp_path):
    """Camera models 7-10 (FOV / fisheye family) parse: per-model param
    counts drive the binary stream layout, so an unknown id is fatal."""
    from gstpu.data.colmap import read_cameras_binary

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 8, W, H))  # SIMPLE_RADIAL_FISHEYE
        f.write(struct.pack("<4d", FX, W / 2, H / 2, 0.01))
        f.write(struct.pack("<iiQQ", 2, 7, W, H))  # FOV
        f.write(struct.pack("<5d", FX, FY, W / 2, H / 2, 0.9))
    cams = read_cameras_binary(str(sparse / "cameras.bin"))
    assert cams[1]["model"] == "SIMPLE_RADIAL_FISHEYE"
    assert cams[1]["params"][0] == FX
    assert cams[2]["model"] == "FOV" and cams[2]["params"][1] == FY


def test_colmap_holdout_zero_trains_on_all(tmp_path):
    _write_model(tmp_path, binary=True)
    all_train = ColmapDataset(str(tmp_path), "train", holdout=0)
    assert len(all_train) == N_IMAGES
    with pytest.raises(FileNotFoundError):
        ColmapDataset(str(tmp_path), "test", holdout=0)


def test_qvec_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    R = qvec_to_rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) == pytest.approx(1.0)


def test_init_model_from_points():
    rng = np.random.default_rng(5)
    xyz = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    cfg = GSConfig(num_points=50)
    m = init_model_from_points(cfg, xyz, rgb)
    n = 50
    assert int(m.n_alive) == n and m.capacity >= n
    np.testing.assert_allclose(np.asarray(m.positions[:n]), xyz)
    np.testing.assert_allclose(np.asarray(m.shs[:n, 0]),
                               (rgb - 0.5) / SH_C0, atol=1e-6)
    assert np.all(np.asarray(m.shs[:n, 1:]) == 0.0)
    scales = np.asarray(m.scales[:n])
    assert np.all(scales > 0) and np.all(scales[:, 0] == scales[:, 1])
    # scale == sqrt(mean squared distance to the 3 nearest neighbors)
    d = np.linalg.norm(xyz[None] - xyz[:, None], axis=-1)
    np.fill_diagonal(d, np.inf)
    knn = np.sort(d, axis=1)[:, :3]
    np.testing.assert_allclose(scales[:, 0],
                               np.sqrt((knn ** 2).mean(1)), rtol=1e-5)
    # activated scheme stores logs/logits
    ma = init_model_from_points(cfg.replace(parameterization="activated"),
                                xyz, rgb)
    np.testing.assert_allclose(np.asarray(ma.scales[:n]), np.log(scales),
                               rtol=1e-5)
    assert np.asarray(ma.opacities[0]) == pytest.approx(
        np.log(0.1 / 0.9), rel=1e-5)


def test_downscale_preserves_fov(tmp_path):
    """downscale=2 halves pixel dims and focals together: image shapes
    shrink, tan_fov (and thus the rendered framing) is unchanged."""
    _write_model(tmp_path, binary=True)
    full = ColmapDataset(str(tmp_path), "train")
    half = ColmapDataset(str(tmp_path), "train", downscale=2)
    assert (half.width, half.height) == (W // 2, H // 2)
    assert half.image(0).shape == (H // 2, W // 2, 3)
    c0, c1 = full.camera(0), half.camera(0)
    assert c1["tan_fovx"] == pytest.approx(c0["tan_fovx"])
    assert c1["tan_fovy"] == pytest.approx(c0["tan_fovy"])
    np.testing.assert_allclose(c1["world_to_camera"],
                               c0["world_to_camera"], atol=1e-6)
    # the projection matrix depends only on the FoV -> identical too
    np.testing.assert_allclose(c1["full_proj_matrix"],
                               c0["full_proj_matrix"], atol=1e-6)


def test_nerf_downscale(tmp_path):
    """The NeRF loader's downscale path: dims halve, FoV fixed."""
    import subprocess
    import sys

    from gstpu.data.nerf import NerfSyntheticDataset

    subprocess.run([sys.executable, "scripts/make_tiny_nerf.py", "--out",
                    str(tmp_path / "tiny")], check=True,
                   capture_output=True)
    full = NerfSyntheticDataset(str(tmp_path / "tiny"), "train")
    half = NerfSyntheticDataset(str(tmp_path / "tiny"), "train", downscale=2)
    assert (half.width, half.height) == (full.width // 2, full.height // 2)
    assert half.image(0).shape == (full.height // 2, full.width // 2, 3)
    assert half.camera(0)["tan_fovx"] == pytest.approx(
        full.camera(0)["tan_fovx"])
    if full.has_depth:
        d, m = half.depth(0)
        assert d.shape == (full.height // 2, full.width // 2)


def test_save_cameras_json_viewer_schema(tmp_path):
    """cameras.json (official 3DGS viewer schema) round-trips the pose."""
    import json

    from gstpu.utils.camera import save_cameras_json

    _write_model(tmp_path, binary=True)
    ds = ColmapDataset(str(tmp_path), "train")
    out = tmp_path / "cameras.json"
    save_cameras_json(ds.cameras, out, ds.image_paths)
    entries = json.load(open(out))
    assert len(entries) == len(ds)
    e = entries[0]
    assert set(e) == {"id", "img_name", "width", "height", "position",
                      "rotation", "fx", "fy"}
    cam = ds.camera(0)
    assert e["fx"] == pytest.approx(FX) and e["fy"] == pytest.approx(FY)
    np.testing.assert_allclose(e["position"], cam["camera_center"],
                               atol=1e-6)
    # rotation is camera-to-world: R_c2w == R_w2c^T
    np.testing.assert_allclose(np.asarray(e["rotation"]),
                               np.asarray(cam["R"]).T, atol=1e-6)
    assert e["img_name"] == "r_01"


@pytest.mark.slow
def test_trainer_multi_focal_rig(tmp_path):
    """End-to-end per-view intrinsics: a two-focal-group rig trains through
    the per-camera tan arrays, and the trainer's stored intrinsics route to
    the right camera (catches a tanfx/tanfy swap or wrong-index wiring —
    geometry would otherwise be silently wrong for every non-cam0 view)."""
    import jax.numpy as jnp

    from gstpu.trainer import Trainer

    _write_model(tmp_path, binary=True)
    _make_mixed_focal_rig(tmp_path)
    cfg = GSConfig(num_iterations=2, min_valid_points=1,
                   save_interval=1 << 30, eval_holdout=0)
    tr = Trainer(str(tmp_path), str(tmp_path / "out"), config=cfg)
    tans = np.asarray(tr._tanfx)
    assert len(np.unique(np.round(tans, 6))) == 2   # two focal groups
    tr.train()                                      # per-camera tans traced
    assert np.isfinite(tr.losses).all()

    # stored per-camera arrays == each camera record's own tans (swap/index
    # wiring check), and the two groups render differently
    cam1 = tr.train_data.camera(1)
    assert float(tr._tanfx[1]) == pytest.approx(cam1["tan_fovx"], rel=1e-6)
    assert float(tr._tanfy[1]) == pytest.approx(cam1["tan_fovy"], rel=1e-6)
    assert cam1["tan_fovx"] != pytest.approx(cam1["tan_fovy"], rel=1e-3)
    settings = tr._settings()
    args = (jnp.asarray(cam1["world_to_camera"]),
            jnp.asarray(cam1["full_proj_matrix"]),
            jnp.asarray(cam1["camera_center"]))
    own, _, _ = tr._render_eval_aux(settings, tr.model, *args,
                                    tr._tanfx[1], tr._tanfy[1])
    cam0 = tr.train_data.camera(0)
    other, _, _ = tr._render_eval_aux(settings, tr.model, *args,
                                      cam0["tan_fovx"], cam0["tan_fovy"])
    own, other = np.asarray(own), np.asarray(other)
    assert own.sum() > 0                            # content rendered
    assert not np.allclose(own, other, atol=1e-5)   # focal actually matters


@pytest.mark.slow
def test_trainer_on_colmap_dataset(tmp_path):
    """End-to-end: the Trainer auto-detects a COLMAP capture, seeds from the
    SfM points, trains a couple of steps, and evaluates the holdout."""
    from gstpu.trainer import Trainer

    _write_model(tmp_path, binary=True)
    cfg = GSConfig(num_iterations=3, min_valid_points=1, save_interval=1 << 30)
    out = tmp_path / "out"
    tr = Trainer(str(tmp_path), str(out), config=cfg)
    assert int(tr.model.n_alive) == N_POINTS      # SfM init, not num_points
    tr.train()
    assert len(tr.losses) == 3
    assert np.isfinite(tr.losses).all()
    recs = (out / "metrics.jsonl").read_text()
    assert '"sfm_init"' in recs

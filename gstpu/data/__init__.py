from gstpu.data.nerf import NerfSyntheticDataset  # noqa: F401

from gstpu.models.gaussians import GaussianModel, init_model  # noqa: F401

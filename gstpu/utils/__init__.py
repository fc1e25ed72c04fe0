from gstpu.utils.camera import Camera, load_camera, world_to_view, projection_matrix  # noqa: F401

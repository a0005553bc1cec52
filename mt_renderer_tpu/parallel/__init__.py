from .tiles import make_row_mesh, render_frame_multichip

__all__ = ["make_row_mesh", "render_frame_multichip"]

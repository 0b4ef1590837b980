from .prb import render_ad  # noqa: F401
from .params import traverse, update_scene  # noqa: F401

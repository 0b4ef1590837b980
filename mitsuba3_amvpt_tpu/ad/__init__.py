from .prb import render_ad, render_ad_forward  # noqa: F401
from .params import traverse, update_scene  # noqa: F401

from . import api  # noqa: F401  (registers "path")
from . import misc  # noqa: F401  (registers "direct", "depth"; aov/moment drivers)
from . import volpath  # noqa: F401  (registers "volpath")
from . import volpathmis  # noqa: F401  (registers "volpathmis")
from . import stokes as _stokes  # noqa: F401  (registers "stokes")
from .api import render, render_pass  # noqa: F401
from .misc import render_aovs, render_moment  # noqa: F401
from .mvpath import render_mvpath  # noqa: F401
from .ptracer import render_ptracer  # noqa: F401
from .spectral import render_spectral  # noqa: F401
from .adaptive import render_multiview_adaptive  # noqa: F401
from .stokes import render_stokes  # noqa: F401

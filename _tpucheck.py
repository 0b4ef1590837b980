import sys, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
import numpy as np
import mitsuba3_amvpt_tpu as mt
from mitsuba3_amvpt_tpu.utils import scenes
sc = mt.load_dict(scenes.cornell_box(res=256))
img = np.asarray(mt.render(sc, spp=64, max_depth=6, seed=0, spp_per_pass=16))
print("mean", img.mean(), flush=True)
np.save(sys.argv[1], img)

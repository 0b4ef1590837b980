from .registry import (MaterialTable, bsdf_sample, bsdf_eval_pdf,  # noqa: F401
                       bsdf_pdf_matrix,
                       bsdf_flags_delta, eval_roughness,
                       D_DIFFUSE, D_CONDUCTOR, D_ROUGHCONDUCTOR, D_DIELECTRIC,
                       D_ROUGHDIELECTRIC, D_PLASTIC, D_ROUGHPLASTIC,
                       D_THINDIELECTRIC, D_NULL)

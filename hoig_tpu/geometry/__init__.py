from hoig_tpu.geometry.mesh import load_obj, save_obj, create_mapping, get_map_fn_dim
from hoig_tpu.geometry.projection import (
    orthographic_proj_withz_idrot,
    look_at,
    vertices_to_faces,
    HOGAN_EYE_Z,
)
from hoig_tpu.geometry.mano import MANOModel, mano_forward

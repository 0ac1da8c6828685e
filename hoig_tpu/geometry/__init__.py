from hoig_tpu.geometry.mesh import load_obj, save_obj, create_mapping, get_map_fn_dim
from hoig_tpu.geometry.projection import (
    orthographic_proj_withz_idrot,
    orthographic_proj_withz_fxfy,
    look_at,
    proj_func,
    vertices_to_faces,
    HOGAN_EYE_Z,
)
from hoig_tpu.geometry.mano import MANOModel, mano_forward
from hoig_tpu.geometry.renderer import (
    ObjectSpec,
    SurfaceTables,
    build_surface_tables,
)
from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow

from fdm_tpu.render.renderer import (  # noqa: F401
    project_orthographic,
    render_frame,
    render_mesh_frame,
    render_sequence,
    write_video,
)
from fdm_tpu.render.voca_rig import (  # noqa: F401
    CAMERA_PARAMS,
    project_voca,
    render_frame_voca,
    vertex_normals,
)

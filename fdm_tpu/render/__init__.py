from fdm_tpu.render.renderer import (  # noqa: F401
    project_orthographic,
    render_frame,
    render_mesh_frame,
    render_sequence,
    write_video,
)

from .channels import (
    CHANNEL_TYPES,
    CIRCULAR_4CH_ARRAY,
    LINEAR_4CH_ARRAY,
    ChannelModel,
    channel_count,
    real_sh_matrix,
)
from .geometry import (
    NavGrid,
    generate_xy_grid_points,
    random_select_start_end_points,
    sample_trajectory,
    select_static_points,
)
from .image_source import (
    ShoeboxRoom,
    band_centers,
    band_masks,
    image_sources,
    render_shoebox_rir,
    render_shoebox_rir_multiband,
)
from .entities import Receiver, Source
from .grid_cache import grid_cache_path, load_room_grid, save_xy_grid_points
from .maps import (
    points_to_pixels,
    save_trace_gif,
    save_trace_image,
    topdown_map,
)
from .visual import (
    habitat_render_fn,
    interpolate_rgb_images,
    render_envmap,
    topdown_render_fn,
)
from .materials import (
    DEFAULT_MATERIALS,
    Material,
    load_material_config,
    material_for_label,
    room_mean_absorption,
)
from .oracle import (
    ACOUSTIC_CONFIG,
    BankRirOracle,
    HabitatRirOracle,
    RirOracle,
    SyntheticRirOracle,
    render_rir_bank,
    save_rir_bank,
)
from .scene import Scene

__all__ = [
    "Receiver",
    "Source",
    "ACOUSTIC_CONFIG",
    "BankRirOracle",
    "CHANNEL_TYPES",
    "CIRCULAR_4CH_ARRAY",
    "ChannelModel",
    "DEFAULT_MATERIALS",
    "HabitatRirOracle",
    "LINEAR_4CH_ARRAY",
    "habitat_render_fn",
    "interpolate_rgb_images",
    "render_envmap",
    "topdown_render_fn",
    "Material",
    "NavGrid",
    "RirOracle",
    "Scene",
    "ShoeboxRoom",
    "SyntheticRirOracle",
    "channel_count",
    "generate_xy_grid_points",
    "grid_cache_path",
    "load_room_grid",
    "save_xy_grid_points",
    "image_sources",
    "load_material_config",
    "material_for_label",
    "points_to_pixels",
    "random_select_start_end_points",
    "real_sh_matrix",
    "render_rir_bank",
    "band_centers",
    "band_masks",
    "render_shoebox_rir",
    "render_shoebox_rir_multiband",
    "room_mean_absorption",
    "sample_trajectory",
    "save_rir_bank",
    "save_trace_gif",
    "save_trace_image",
    "topdown_map",
]

"""parallel: mesh construction and sharded multi-channel / multi-chip scans."""

from .mesh import (channel_sharding, init_distributed, make_mesh,  # noqa: F401
                   replicated)
from .sharded import (channel_scan, halo_exchange_right,  # noqa: F401
                      time_sharded_scan)

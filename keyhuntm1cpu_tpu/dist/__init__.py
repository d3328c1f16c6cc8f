"""Multi-node distribution layer.

Two tiers (SURVEY.md §2.4 "Multi-node distribution"):

- Within a pod slice: `jax.sharding` meshes + collectives (parallel/).
- Across independent hosts/slices: the coordinator/worker control plane in
  this package — a working implementation of the reference's declared-but-
  bodiless WorkCoordinator / DistributedWorker / RangePartitioner design
  (include/keyhunt/core/distributed.h:34-345), replacing its only real
  mechanism (the single-client bsgsd TCP daemon + external orchestration
  scripts, bsgsd.cpp:1318-1381, vastai_deploy.sh).
"""

from .coordinator import WorkCoordinator, WorkUnit, CoordinatorServer
from .worker import DistributedWorker

__all__ = ["WorkCoordinator", "WorkUnit", "CoordinatorServer", "DistributedWorker"]

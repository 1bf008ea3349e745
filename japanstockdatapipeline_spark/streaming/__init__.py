from . import incremental, jobs

__all__ = ["incremental", "jobs"]

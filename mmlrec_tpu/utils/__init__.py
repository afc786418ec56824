from .results import append_result_row
from .seeding import set_seed

__all__ = ["append_result_row", "set_seed"]

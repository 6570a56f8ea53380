from probav_tpu.infer.resolver import (
    Resolver,
    load_removed_sets,
    write_submission,
)

__all__ = ["Resolver", "load_removed_sets", "write_submission"]

from . import edges, text  # noqa: F401

from .validator import DarknetValidator  # noqa: F401

from . import liquid_oracle  # noqa: F401

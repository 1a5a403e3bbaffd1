"""Pipeline assembly and the driver-facing query registry."""

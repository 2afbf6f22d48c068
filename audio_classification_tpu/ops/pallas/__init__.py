"""pallas subpackage."""

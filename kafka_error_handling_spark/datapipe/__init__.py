"""datapipe subpackage."""

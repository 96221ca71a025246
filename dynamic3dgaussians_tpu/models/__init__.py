"""Scene parameter models: gaussian tables, motion bases."""

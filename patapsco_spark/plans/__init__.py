"""Job planning: manifests, per-partition lineage, resume gates."""

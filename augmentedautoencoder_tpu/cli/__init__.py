"""Console entry points mirroring the reference CLI surface
(ae_init_workspace, ae_train, ae_embed, ae_eval, aae_image)."""


def split_experiment_name(full: str):
    """'group/name' -> (name, group); bare 'name' -> (name, '')."""
    parts = full.split("/")
    name = parts.pop()
    group = parts.pop() if parts else ""
    return name, group

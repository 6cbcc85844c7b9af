from .tree import TaxonomyTree  # noqa: F401

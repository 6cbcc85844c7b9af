"""TaxonomyTree tests: graph construction, matrices, distances, save/load."""

import numpy as np
import pytest

from linnaeus_tpu.utils.taxonomy import TaxonomyTree


@pytest.fixture
def small_tree():
    # 2 levels: fine L10 (4 classes) -> coarse L20 (2 classes)
    # L10: 0->0, 1->0, 2->1, 3->1
    hierarchy_map = {"taxa_L10": {0: 0, 1: 0, 2: 1, 3: 1}}
    return TaxonomyTree(
        hierarchy_map,
        task_keys=["taxa_L10", "taxa_L20"],
        num_classes={"taxa_L10": 4, "taxa_L20": 2},
    )


def test_parents_and_children(small_tree):
    assert small_tree.get_parent(("taxa_L10", 0)) == ("taxa_L20", 0)
    assert small_tree.get_parent(("taxa_L10", 3)) == ("taxa_L20", 1)
    assert set(small_tree.get_children(("taxa_L20", 0))) == {
        ("taxa_L10", 0),
        ("taxa_L10", 1),
    }


def test_roots_and_leaves(small_tree):
    assert ("taxa_L20", 0) in small_tree.roots
    assert ("taxa_L10", 0) in small_tree.leaves
    assert ("taxa_L20", 0) not in small_tree.leaves


def test_hierarchy_matrices(small_tree):
    mats = small_tree.build_hierarchy_matrices()
    assert list(mats.keys()) == ["taxa_L20_taxa_L10"]
    m = mats["taxa_L20_taxa_L10"]
    assert m.shape == (2, 4)
    np.testing.assert_array_equal(m, [[1, 1, 0, 0], [0, 0, 1, 1]])


def test_distances(small_tree):
    # siblings: up to parent and back = 2
    assert small_tree.get_distance(("taxa_L10", 0), ("taxa_L10", 1)) == 2
    # child to its parent = 1
    assert small_tree.get_distance(("taxa_L10", 0), ("taxa_L20", 0)) == 1
    assert small_tree.get_distance(("taxa_L10", 0), ("taxa_L10", 0)) == 0


def test_distance_matrix(small_tree):
    d = small_tree.build_distance_matrix("taxa_L10")
    assert d.shape == (4, 4)
    assert d[0, 1] == 2  # same parent
    assert d[0, 2] == 4  # disconnected roots => far distance (2*num_levels)
    assert np.all(np.diag(d) == 0)


def test_out_of_bounds_links_skipped():
    tree = TaxonomyTree(
        {"a": {0: 0, 5: 1}},  # child idx 5 out of bounds -> skipped
        task_keys=["a", "b"],
        num_classes={"a": 2, "b": 2},
    )
    assert tree.get_parent(("a", 0)) == ("b", 0)
    assert tree.get_parent(("a", 1)) is None


def test_save_load_roundtrip(small_tree, tmp_path):
    path = str(tmp_path / "tree.json")
    small_tree.save(path)
    loaded = TaxonomyTree.load(path)
    assert loaded.task_keys == small_tree.task_keys
    assert loaded.num_classes == small_tree.num_classes
    np.testing.assert_array_equal(
        loaded.build_hierarchy_matrices()["taxa_L20_taxa_L10"],
        small_tree.build_hierarchy_matrices()["taxa_L20_taxa_L10"],
    )


def test_four_level_chain():
    # L10(8) -> L20(4) -> L30(2) -> L40(1)
    hm = {
        "taxa_L10": {i: i // 2 for i in range(8)},
        "taxa_L20": {i: i // 2 for i in range(4)},
        "taxa_L30": {i: 0 for i in range(2)},
    }
    tree = TaxonomyTree(
        hm,
        task_keys=["taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40"],
        num_classes={"taxa_L10": 8, "taxa_L20": 4, "taxa_L30": 2, "taxa_L40": 1},
    )
    mats = tree.build_hierarchy_matrices()
    assert set(mats) == {
        "taxa_L20_taxa_L10",
        "taxa_L30_taxa_L20",
        "taxa_L40_taxa_L30",
    }
    assert tree.get_root(("taxa_L10", 7)) == ("taxa_L40", 0)
    # cousins at L10 distance: up 2 to L30, down 2 = 4
    assert tree.get_distance(("taxa_L10", 0), ("taxa_L10", 2)) == 4

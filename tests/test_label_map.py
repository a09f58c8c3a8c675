"""pbtxt label-map parsing (pose/label_map.py) vs the TF-OD grammar.

Reference behavior: auto_pose/test/googledet_utils/label_map_util.py
(protobuf text_format based) — same outputs, no TF/protobuf dependency.
"""

import pytest

from augmentedautoencoder_tpu.pose.interfaces import BoundingBox
from augmentedautoencoder_tpu.pose.label_map import (
    convert_label_map_to_categories,
    create_category_index,
    create_category_index_from_labelmap,
    load_labelmap,
    remap_box_classes,
)

PBTXT = """
# mscoco-style label map
item {
  id: 1
  name: 'obj_000001'
  display_name: "duck"
}
item {
  name: "obj_000005"
  id: 5
}
"""


@pytest.fixture
def pbtxt_path(tmp_path):
    p = tmp_path / "labels.pbtxt"
    p.write_text(PBTXT)
    return str(p)


def test_load_labelmap(pbtxt_path):
    items = load_labelmap(pbtxt_path)
    assert items == [
        {"id": 1, "name": "obj_000001", "display_name": "duck"},
        {"name": "obj_000005", "id": 5},
    ]


def test_display_name_preference(pbtxt_path):
    cats = convert_label_map_to_categories(load_labelmap(pbtxt_path), 99)
    assert cats == [{"id": 1, "name": "duck"}, {"id": 5, "name": "obj_000005"}]
    cats = convert_label_map_to_categories(
        load_labelmap(pbtxt_path), 99, use_display_name=False
    )
    assert cats[0]["name"] == "obj_000001"


def test_max_num_classes_filters(pbtxt_path):
    cats = convert_label_map_to_categories(load_labelmap(pbtxt_path), 2)
    assert [c["id"] for c in cats] == [1]


def test_category_index(pbtxt_path):
    idx = create_category_index_from_labelmap(pbtxt_path)
    assert idx[5]["name"] == "obj_000005"
    assert create_category_index([{"id": 3, "name": "x"}]) == {3: {"id": 3, "name": "x"}}


def test_id_zero_rejected(tmp_path):
    p = tmp_path / "bad.pbtxt"
    p.write_text("item { id: 0 name: 'bg' }")
    with pytest.raises(ValueError, match=">= 1"):
        load_labelmap(str(p))


def test_escaped_quotes(tmp_path):
    p = tmp_path / "esc.pbtxt"
    p.write_text("item { id: 1 name: 'it\\'s' }")
    assert load_labelmap(str(p))[0]["name"] == "it's"


def test_remap_box_classes(pbtxt_path):
    idx = create_category_index_from_labelmap(pbtxt_path)
    boxes = [
        BoundingBox(0.1, 0.1, 0.5, 0.5, classes={1: 0.9, "5": 0.4, "already": 0.2}),
    ]
    remap_box_classes(boxes, idx)
    assert boxes[0].classes == {"duck": 0.9, "obj_000005": 0.4, "already": 0.2}

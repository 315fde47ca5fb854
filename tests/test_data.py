import json
import os

import numpy as np
import pytest

from single_shot_detection_tpu.data.datasets import (Coco, ConcatDataset, Csv,
                                                     CustomVoc, Synthetic,
                                                     Txt, Voc)
from single_shot_detection_tpu.data.loader import Loader, create_loaders


VOC_XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object>
    <name>{cls}</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
  </object>
  <object>
    <name>car</name><difficult>1</difficult>
    <bndbox><xmin>-5</xmin><ymin>5</ymin><xmax>200</xmax><ymax>70</ymax></bndbox>
  </object>
</annotation>"""


def _write_image(path, w=100, h=80):
    from PIL import Image
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


@pytest.fixture
def voc_root(tmp_path):
    root = tmp_path / 'voc'
    for sub in ['ImageSets/Main', 'Annotations', 'JPEGImages']:
        (root / 'VOC2007' / sub).mkdir(parents=True)
    ids = ['000001', '000002']
    (root / 'VOC2007/ImageSets/Main/trainval.txt').write_text('\n'.join(ids))
    for i in ids:
        (root / 'VOC2007/Annotations' / f'{i}.xml').write_text(
            VOC_XML.format(name=i, cls='dog'))
        _write_image(root / 'VOC2007/JPEGImages' / f'{i}.jpg')
    return str(root)


def test_voc_parsing(voc_root):
    ds = Voc(voc_root, [(2007, 'trainval')])
    assert len(ds) == 2
    boxes = ds.boxes(0)
    assert boxes.shape == (2, 7)
    np.testing.assert_allclose(boxes[0], [10, 20, 50, 60,
                                          ds.class_labels.index('dog'), 1.0, 0])
    # clipping + difficult flag
    np.testing.assert_allclose(boxes[1, :4], [0, 5, 99, 70])
    assert boxes[1, 6] == 1
    img = ds.load_image(0)
    assert img.shape == (80, 100, 3)


def test_coco_parsing(tmp_path):
    root = tmp_path / 'coco'
    (root / 'annotations').mkdir(parents=True)
    (root / 'val2017').mkdir()
    payload = {
        'images': [{'id': 1, 'file_name': 'a.jpg', 'width': 100, 'height': 80}],
        'annotations': [
            {'image_id': 1, 'category_id': 18, 'bbox': [10, 20, 30, 30],
             'iscrowd': 0},
            {'image_id': 1, 'category_id': 18, 'bbox': [0, 0, 5, 5],
             'iscrowd': 1},  # crowd -> dropped
        ],
        'categories': [{'id': 18, 'name': 'dog'}, {'id': 1, 'name': 'person'}],
    }
    (root / 'annotations/instances_val2017.json').write_text(json.dumps(payload))
    _write_image(root / 'val2017/a.jpg')
    ds = Coco(str(root), val=True, year=2017, with_crowd=False)
    assert len(ds) == 1
    boxes = ds.boxes(0)
    assert boxes.shape == (1, 6)
    np.testing.assert_allclose(boxes[0, :4], [10, 20, 40, 50])
    assert boxes[0, 4] == 2  # id 18 -> second sorted category


def test_custom_voc_and_label_map(tmp_path):
    root = tmp_path / 'cvoc'
    root.mkdir()
    (root / 'img1.xml').write_text(VOC_XML.format(name='img1', cls='doggo'))
    _write_image(root / 'img1.jpg')
    ds = CustomVoc(str(root), labels=['background', 'dog', 'car'],
                   label_map={'doggo': 'dog'})
    assert len(ds) == 1
    assert ds.boxes(0)[0, 4] == 1


def test_csv_dataset(tmp_path):
    img = tmp_path / 'i.jpg'
    _write_image(img)
    f = tmp_path / 'data.csv'
    f.write_text(f'i.jpg,1,2,30,40,dog\ni.jpg,5,6,20,22,car,0.5\n')
    ds = Csv(str(f), labels=['background', 'dog', 'car'])
    assert len(ds) == 1
    boxes = ds.boxes(0)
    assert boxes.shape == (2, 6)
    assert boxes[0, 4] == 1 and boxes[1, 4] == 2
    assert boxes[1, 5] == 0.5


def test_txt_dataset(tmp_path):
    _write_image(tmp_path / 'x.jpg')
    (tmp_path / 'x.txt').write_text('1 2 30 40 2\n3 4 10 12\n')
    ds = Txt(str(tmp_path), labels=['background', 'a', 'b'])
    assert len(ds) == 1
    boxes = ds.boxes(0)
    assert boxes[0, 4] == 2 and boxes[1, 4] == 1  # default label 1


def test_concat_dataset(tmp_path):
    a = Synthetic(num_images=3, image_size=32, num_classes=4, seed=1)
    b = Synthetic(num_images=2, image_size=32, num_classes=4, seed=2)
    ds = ConcatDataset([a, b])
    assert len(ds) == 5


def test_loader_padding_and_shapes():
    ds = Synthetic(num_images=10, image_size=64, num_classes=5, max_boxes=3)
    loader = Loader(ds, batch_size=4, staging_size=(64, 64), shuffle=True,
                    drop_last=True, max_gt=8, num_workers=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    for batch in batches:
        assert batch['image'].shape == (4, 64, 64, 3)
        assert batch['boxes'].shape == (4, 8, 7)
        assert batch['box_mask'].shape == (4, 8)
        assert batch['box_mask'].sum() > 0
        # valid rows have positive extents
        m = batch['box_mask']
        b = batch['boxes'][m]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_loader_host_sharding():
    ds = Synthetic(num_images=16, image_size=32, num_classes=3)
    l0 = Loader(ds, batch_size=2, staging_size=(32, 32), process_count=2,
                process_index=0, num_workers=1)
    l1 = Loader(ds, batch_size=2, staging_size=(32, 32), process_count=2,
                process_index=1, num_workers=1)
    ids0 = np.concatenate([b['ids'] for b in l0])
    ids1 = np.concatenate([b['ids'] for b in l1])
    assert set(ids0[ids0 >= 0]) & set(ids1[ids1 >= 0]) == set()
    assert len(set(ids0[ids0 >= 0]) | set(ids1[ids1 >= 0])) == 16


def test_loader_staging_rescales_boxes():
    ds = Synthetic(num_images=2, image_size=100, num_classes=3, max_boxes=1)
    loader = Loader(ds, batch_size=2, staging_size=(50, 50), num_workers=1)
    batch = next(iter(loader))
    assert batch['image'].shape[1:3] == (50, 50)
    m = batch['box_mask']
    assert (batch['boxes'][m][:, :4] <= 49).all()


def test_create_loaders_eval_batch_doubles():
    ds = Synthetic(num_images=8, image_size=32, num_classes=3)
    loaders = create_loaders({'train': ds, 'eval': ds}, batch_size=2,
                             staging_size=(32, 32), shuffle=True)
    assert loaders['train'].batch_size == 2
    assert loaders['eval'].batch_size == 4
    assert loaders['train'].drop_last and not loaders['eval'].drop_last


def test_loader_truncates_excess_gt():
    ds = Synthetic(num_images=4, image_size=32, num_classes=3, max_boxes=6)
    loader = Loader(ds, batch_size=4, staging_size=(32, 32), max_gt=2,
                    num_workers=1)
    batch = next(iter(loader))
    assert batch['boxes'].shape == (4, 2, 7)
    assert batch['box_mask'].sum(axis=1).max() <= 2

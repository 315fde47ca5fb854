"""Offline dataset resize: shrink images so the smallest side matches a
target, rewriting VOC XML annotations to the new geometry.

Functional-parity target: reference ``tools/resizeToSmallest.py`` (joblib-
parallel cv2 resize + XML rewrite); here a thread pool + PIL/cv2.
"""

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor
from xml.etree import ElementTree

import numpy as np


def resize_one(xml_path: str, target: int, output: str):
    tree = ElementTree.parse(xml_path)
    root = tree.getroot()
    size = root.find('size')
    width = int(size.findtext('width'))
    height = int(size.findtext('height'))
    smallest = min(width, height)
    if smallest <= target:
        return False
    scale = target / smallest
    new_w, new_h = round(width * scale), round(height * scale)

    folder = os.path.dirname(xml_path)
    image_path = os.path.join(folder, root.findtext('filename'))
    if not os.path.exists(image_path):
        return False

    from PIL import Image
    with Image.open(image_path) as im:
        im = im.resize((new_w, new_h), Image.BILINEAR)
        rel = os.path.relpath(image_path, start=os.path.dirname(output) or '.')
        out_img = os.path.join(output, os.path.basename(image_path))
        os.makedirs(output, exist_ok=True)
        im.save(out_img)
        del rel

    size.find('width').text = str(new_w)
    size.find('height').text = str(new_h)
    for obj in root.iter('object'):
        bb = obj.find('bndbox')
        for tag, s in (('xmin', scale), ('ymin', scale),
                       ('xmax', scale), ('ymax', scale)):
            el = bb.find(tag)
            el.text = str(int(round(float(el.text) * s)))
    tree.write(os.path.join(output, os.path.basename(xml_path)))
    return True


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', required=True,
                        help='Directory searched recursively for *.xml')
    parser.add_argument('--size', type=int, required=True,
                        help='Target smallest-side size')
    parser.add_argument('--output', required=True)
    parser.add_argument('--workers', type=int, default=8)
    args = parser.parse_args()

    xmls = glob.glob(os.path.join(args.root, '**', '*.xml'), recursive=True)
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        results = list(pool.map(
            lambda p: resize_one(p, args.size, args.output), xmls))
    print(f'resized {int(np.sum(results))}/{len(xmls)} images')


if __name__ == '__main__':
    main()

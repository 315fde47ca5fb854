import os
import textwrap

from single_shot_detection_tpu.utils.config import load_config


def write_config(tmp_path, body):
    p = tmp_path / 'cfg.py'
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_load_and_attribute_defaults(tmp_path):
    path = write_config(tmp_path, """
        batch_size = 32
        dataset = {'train': {'name': 'Voc'}, 'eval': {'name': 'Voc'}}
    """)
    cfg = load_config(path)
    assert cfg.batch_size == 32
    assert cfg.nonexistent == {}  # {} default (config_wrapper.py:15)
    assert cfg.is_voc('train')


def test_phase_filtering(tmp_path):
    path = write_config(tmp_path, """
        dataset = {'train': {'name': 'Voc'}, 'eval': {'name': 'Coco'}}
    """)
    cfg = load_config(path, phases=['eval'])
    assert 'train' not in cfg.dataset
    assert 'eval' in cfg.dataset


def test_env_interpolation(tmp_path):
    os.environ['SSD_TEST_HOME'] = '/data'
    path = write_config(tmp_path, """
        dataset = {'train': {'root': '{SSD_TEST_HOME}/voc'}}
    """)
    cfg = load_config(path)
    assert cfg.dataset['train']['root'] == '/data/voc'


def test_runtime_context_with_arithmetic(tmp_path):
    path = write_config(tmp_path, """
        train = {'scheduler': {'T_max': '{total_train_steps} * 2'}}
    """)
    cfg = load_config(path)
    # unresolved until context arrives (object_formatter.py:18-29)
    assert cfg.train['scheduler']['T_max'] == '{total_train_steps} * 2'
    cfg.update({'total_train_steps': 100})
    assert cfg.train['scheduler']['T_max'] == 200


def test_nested_list_interpolation(tmp_path):
    path = write_config(tmp_path, """
        augmentations = [{'name': 'X', 'args': {'path': '{FOO_BAR_BAZ}/f'}}]
    """)
    os.environ.pop('FOO_BAR_BAZ', None)
    cfg = load_config(path)
    # unresolvable field stays verbatim
    assert cfg.augmentations[0]['args']['path'] == '{FOO_BAR_BAZ}/f'
    cfg.update({'FOO_BAR_BAZ': '/x'})
    assert cfg.augmentations[0]['args']['path'] == '/x/f'

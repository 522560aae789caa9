"""batchgenerators.utilities.file_and_folder_operations stand-in: the small
path/pickle/json helper surface that reference modules star-import."""
import json
import os
import pickle

join = os.path.join
isdir = os.path.isdir
isfile = os.path.isfile
listdir = os.listdir
os_split_path = os.path.split


def maybe_mkdir_p(directory):
    os.makedirs(directory, exist_ok=True)


def subdirs(folder, join_=True, prefix=None, suffix=None, sort=True):
    return _sub(folder, os.path.isdir, join_, prefix, suffix, sort)


def subfiles(folder, join=True, prefix=None, suffix=None, sort=True):
    return _sub(folder, os.path.isfile, join, prefix, suffix, sort)


def nifti_files(folder, join=True, sort=True):
    return subfiles(folder, join=join, suffix=".nii.gz", sort=sort)


def _sub(folder, pred, join_, prefix, suffix, sort):
    res = [(os.path.join(folder, i) if join_ else i) for i in os.listdir(folder)
           if pred(os.path.join(folder, i))
           and (prefix is None or i.startswith(prefix))
           and (suffix is None or i.endswith(suffix))]
    if sort:
        res.sort()
    return res


def load_pickle(file, mode="rb"):
    with open(file, mode) as f:
        return pickle.load(f)


def write_pickle(obj, file, mode="wb"):
    with open(file, mode) as f:
        pickle.dump(obj, f)


save_pickle = write_pickle


def load_json(file):
    with open(file) as f:
        return json.load(f)


def save_json(obj, file, indent=4, sort_keys=True):
    with open(file, "w") as f:
        json.dump(obj, f, sort_keys=sort_keys, indent=indent)


def pardir(path):
    return os.path.join(path, os.pardir)

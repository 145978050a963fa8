#!/usr/bin/env python
"""Generate the scene list files under lists/.

The reference ships static scan lists (lists/dtu/, lists/BDS8/, lists/Bin/;
SURVEY.md §2 component 35). The DTU train/val/test split below is the
standard MVSNet split (Yao et al. 2018, used by all public MVSNet forks);
the BDS/Bin lists are simple enumerations of synthetic scene folders.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# standard MVSNet DTU training split (79 scans)
DTU_TRAIN = [
    2, 6, 7, 8, 14, 16, 18, 19, 20, 22, 30, 31, 36, 39, 41, 42, 44, 45, 46,
    47, 50, 51, 52, 53, 55, 57, 58, 60, 61, 63, 64, 65, 68, 69, 70, 71, 72,
    74, 76, 83, 84, 85, 87, 88, 89, 90, 91, 92, 93, 94, 95, 96, 97, 98, 99,
    100, 101, 102, 103, 104, 105, 107, 108, 109, 111, 112, 113, 115, 116,
    119, 120, 121, 122, 123, 124, 125, 126, 127, 128,
]
# standard MVSNet DTU validation split (18 scans)
DTU_VAL = [3, 5, 17, 21, 28, 35, 37, 38, 40, 43, 56, 59, 66, 67, 82, 86, 106, 117]
# standard MVSNet DTU evaluation split (22 scans)
DTU_TEST = [1, 4, 9, 10, 11, 12, 13, 15, 23, 24, 29, 32, 33, 34, 48, 49, 62,
            75, 77, 110, 114, 118]


def write(path: str, names: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"wrote {path} ({len(names)} entries)")


def main() -> None:
    lists = os.path.join(REPO, "lists")
    write(os.path.join(lists, "dtu", "train.txt"), [f"scan{i}" for i in DTU_TRAIN])
    write(os.path.join(lists, "dtu", "val.txt"), [f"scan{i}" for i in DTU_VAL])
    write(os.path.join(lists, "dtu", "test.txt"), [f"scan{i}" for i in DTU_TEST])

    # BDS8 synthetic Blender dataset: enumerated scene folders
    bds_train = [f"scene_{i:0>3}" for i in range(200) if i % 10 != 0]
    bds_val = [f"scene_{i:0>3}" for i in range(0, 200, 10)]
    write(os.path.join(lists, "BDS8", "train200.txt"), bds_train)
    write(os.path.join(lists, "BDS8", "val200.txt"), bds_val)
    write(os.path.join(lists, "BDS8", "eval.txt"), ["scene_000"])

    # Bin real-camera rig: single-acquisition eval lists
    write(os.path.join(lists, "Bin", "eval.txt"), ["binpicking"])


if __name__ == "__main__":
    main()

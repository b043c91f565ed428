"""Normalize BraTS2023 download filenames: strip the case-name prefix so each
case directory holds {t1c,t1n,t2f,t2w,seg}.nii.gz.

Parity with /root/reference/1_rename_mri_data.py (rename `CASE-mod.nii.gz`
-> `mod.nii.gz`), with the directory taken from the CLI instead of an edited
constant.
"""

import argparse
import os


def rename_cases(data_dir, dry_run=False):
    renamed = 0
    for case_name in sorted(os.listdir(data_dir)):
        case_dir = os.path.join(data_dir, case_name)
        if not os.path.isdir(case_dir):
            continue
        for data_name in sorted(os.listdir(case_dir)):
            if "-" not in data_name:
                continue
            new_name = data_name.split("-")[-1]
            old_path = os.path.join(case_dir, data_name)
            new_path = os.path.join(case_dir, new_name)
            if dry_run:
                print(f"{old_path} -> {new_path}")
            else:
                os.rename(old_path, new_path)
            renamed += 1
    print(f"renamed {renamed} files in {data_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?",
                    default="./data/raw_data/BraTS2023/"
                            "ASNR-MICCAI-BraTS2023-GLI-Challenge-TrainingData/")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    rename_cases(args.data_dir, args.dry_run)

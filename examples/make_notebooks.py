"""Generate the runnable .ipynb twins of the reference's three notebooks
(diffedit_inpaint.ipynb, Score_SDE_demo_PyTorch.ipynb,
latent_imagenet_diffusion.ipynb). Each notebook wraps the corresponding
script twin in this directory: a markdown intro (the script's docstring),
a parameters cell, and an execution cell that runs the script's flow
in-process (tiny/CPU fallback so the notebook is runnable with no
checkpoints). Regenerate with: python examples/make_notebooks.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def cells_for(script, params, title, ref):
    doc = []
    with open(os.path.join(HERE, script)) as f:
        src = f.read()
    doc = src.split('"""')[1].strip()
    md = f"# {title}\n\nNotebook twin of the reference `{ref}`.\n\n" + doc
    param_src = "\n".join(params)
    run_src = (
        "import os, runpy, sys\n"
        "sys.argv = [SCRIPT] + ARGS\n"
        "runpy.run_path(os.path.join(os.getcwd(), SCRIPT),\n"
        "               run_name='__main__')\n"
    )
    show_src = (
        "# display the artifacts the run wrote (PNG grids / edited images)\n"
        "import glob\n"
        "from IPython.display import Image, display\n"
        "for p in sorted(glob.glob(os.path.join(OUTDIR, '*.png')))[:8]:\n"
        "    print(p)\n"
        "    display(Image(filename=p))\n"
    )

    def code(srctext):
        return {"cell_type": "code", "execution_count": None,
                "metadata": {}, "outputs": [],
                "source": srctext.splitlines(keepends=True)}

    return [
        {"cell_type": "markdown", "metadata": {},
         "source": md.splitlines(keepends=True)},
        code(param_src),
        code(run_src),
        code(show_src),
    ]


NOTEBOOKS = {
    "diffedit_inpaint.ipynb": dict(
        script="diffedit_demo.py",
        title="DiffEdit: mask-free prompt-to-prompt editing",
        ref="examples/stable-diffusion/scripts/diffedit_inpaint.ipynb",
        params=[
            "SCRIPT = 'diffedit_demo.py'",
            "OUTDIR = '/tmp/diffedit_demo'",
            "# pass --ckpt/--clip for real SD weights; tiny fallback "
            "otherwise",
            "ARGS = ['--cpu', '--outdir', OUTDIR,",
            "        '--src', 'a bowl of apples',",
            "        '--dst', 'a bowl of oranges']",
        ]),
    "score_sde_demo.ipynb": dict(
        script="score_sde_demo.py",
        title="Score SDE sampling (PC / ODE / DPM-Solver)",
        ref="examples/score_sde_pytorch/Score_SDE_demo_PyTorch.ipynb",
        params=[
            "SCRIPT = 'score_sde_demo.py'",
            "OUTDIR = '/tmp/score_sde_demo'",
            "ARGS = ['--cpu', '--outdir', OUTDIR]",
        ]),
    "latent_imagenet_diffusion.ipynb": dict(
        script="latent_imagenet_demo.py",
        title="Class-conditional latent diffusion (cin256)",
        ref="examples/stable-diffusion/scripts/latent_imagenet_diffusion.ipynb",
        params=[
            "SCRIPT = 'latent_imagenet_demo.py'",
            "OUTDIR = '/tmp/latent_imagenet_demo'",
            "ARGS = ['--cpu', '--outdir', OUTDIR]",
        ]),
}


def main():
    for name, spec in NOTEBOOKS.items():
        nb = {
            "cells": cells_for(spec["script"], spec["params"],
                               spec["title"], spec["ref"]),
            "metadata": {"kernelspec": {"display_name": "Python 3",
                                        "language": "python",
                                        "name": "python3"},
                         "language_info": {"name": "python"}},
            "nbformat": 4,
            "nbformat_minor": 5,
        }
        path = os.path.join(HERE, name)
        with open(path, "w") as f:
            json.dump(nb, f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()

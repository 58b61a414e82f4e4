# Port of the reference example script gtscripts/sketch_constructed.lua
# (ref: /root/reference/gtscripts/sketch_constructed.lua): construct
# features programmatically and sketch them to an image file.
import sys

if len(arg) != 3:
    sys.stderr.write(f"Usage: {arg[0]} Style_file Out_file\n")
    sys.exit(1)
style_file, out_file = arg[1], arg[2]

from genometools_tpu.anno.sketch import sketch
from genometools_tpu.anno.style import load_style

style = load_style(style_file)

seqid = "chromosome_21"
gene = gt.feature_node_new(seqid, "gene", 100, 900, "+")
gene.add_child(gt.feature_node_new(seqid, "exon", 100, 200, "+"))
gene.add_child(gt.feature_node_new(seqid, "intron", 201, 799, "+"))
gene.add_child(gt.feature_node_new(seqid, "exon", 800, 900, "+"))
reverse_gene = gt.feature_node_new(seqid, "gene", 400, 600, "-")
reverse_gene.add_child(gt.feature_node_new(seqid, "exon", 400, 600, "-"))
nodes = [gene, reverse_gene]

fmt = "png" if out_file.endswith(".png") else "svg"
data = sketch(nodes, seqid=seqid, width=600, fmt=fmt, style=style,
              view=gt.range(1, 1000))
mode = "wb" if isinstance(data, (bytes, bytearray)) else "w"
with open(out_file, mode) as f:
    f.write(data)

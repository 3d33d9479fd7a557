"""Generate the vendored dataset fixtures under raylinkgraph/sources/data/.

The reference's ``graphscope.dataset`` loaders download fixture tarballs
(cora, u2i, ldbc_sample, ogbn_mag_small — python/graphscope/dataset/*.py);
this sandbox has no network, so deterministic synthetic stand-ins are
generated ONCE by this script in the reference's exact file layouts
(same file names, same headers, same delimiters) and committed. Pure
arithmetic — no RNG — so re-running reproduces the bytes exactly.
"""

import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "raylinkgraph", "sources", "data")


def write(path: str, header: str, rows, delim: str) -> None:
    path = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(delim.join(header.split()) + "\n")
        for r in rows:
            f.write(delim.join(str(x) for x in r) + "\n")


def gen_cora() -> None:
    # node.csv: id + 8 binary word features + class label (comma, header —
    # cora.py:85 add_vertices(node.csv, "paper"))
    n = 48
    classes = ["nn", "rule", "rl", "prob", "case", "genetic", "theory"]
    nodes = [
        [i] + [(i >> b) & 1 for b in range(8)] + [classes[i % 7]]
        for i in range(n)
    ]
    write("cora/node.csv", "id " + " ".join(f"w{b}" for b in range(8)) + " label",
          nodes, ",")
    # edge.csv: citation pairs — each paper cites up to 3 earlier papers
    edges = []
    for i in range(1, n):
        for k in (1, 2, 3):
            j = (i * 7 + k * 11) % i  # strictly earlier -> acyclic
            if j != i and (i, j) not in edges:
                edges.append((i, j))
    write("cora/edge.csv", "src_id dst_id", sorted(set(edges)), ",")


def gen_u2i() -> None:
    # node.csv (TSV: id, feature) — one shared id space; the loader
    # registers it as BOTH 'u' and 'i' labels (u2i.py:88-103). Users get
    # ids 0..19, items 100..129 so the bipartite structure is explicit.
    users = list(range(20))
    items = list(range(100, 130))
    nodes = [(i, f"f{i % 5}:{(i * 3) % 7}") for i in users + items]
    write("u2i/node.csv", "id feature", nodes, "\t")
    # edge.csv (TSV: src_id, dst_id, weight) — each user buys 5 items
    edges = []
    for u in users:
        for k in range(5):
            it = 100 + (u * 7 + k * 13) % 30
            edges.append((u, it, 1.0 + ((u + k) % 4)))
    write("u2i/edge.csv", "src_id dst_id weight", edges, "\t")


def gen_ldbc() -> None:
    # ldbc_sample layout (ldbc.py:76-460): 8 vertex files + 23 edge files,
    # '|' delimited, header row. Tiny but referentially consistent.
    P, C, PO, F, T, TC, PL, O = 12, 20, 15, 5, 8, 4, 6, 5
    d = "ldbc_sample"
    day = "2010-01-{:02d}T00:00:00".format
    write(f"{d}/person_0_0.csv",
          "id firstName lastName gender birthday creationDate locationIP browserUsed",
          [(i, f"First{i}", f"Last{i}", ["male", "female"][i % 2],
            f"1980-0{i % 9 + 1}-01", day(i % 28 + 1), f"10.0.0.{i}",
            ["Firefox", "Chrome", "Safari"][i % 3]) for i in range(P)], "|")
    write(f"{d}/comment_0_0.csv",
          "id creationDate locationIP browserUsed content length",
          [(i, day(i % 28 + 1), f"10.1.0.{i}", "Firefox",
            f"comment text {i}", 10 + i) for i in range(C)], "|")
    write(f"{d}/post_0_0.csv",
          "id imageFile creationDate locationIP browserUsed language content length",
          [(i, f"photo{i}.jpg", day(i % 28 + 1), f"10.2.0.{i}", "Chrome",
            ["uz", "tk"][i % 2], f"post text {i}", 20 + i) for i in range(PO)], "|")
    write(f"{d}/forum_0_0.csv", "id title creationDate",
          [(i, f"Forum {i}", day(i % 28 + 1)) for i in range(F)], "|")
    write(f"{d}/tag_0_0.csv", "id name url",
          [(i, f"tag{i}", f"http://dbpedia.org/tag{i}") for i in range(T)], "|")
    write(f"{d}/tagclass_0_0.csv", "id name url",
          [(i, f"class{i}", f"http://dbpedia.org/class{i}") for i in range(TC)], "|")
    write(f"{d}/place_0_0.csv", "id name url type",
          [(i, f"place{i}", f"http://dbpedia.org/place{i}",
            ["city", "country", "continent"][i % 3]) for i in range(PL)], "|")
    write(f"{d}/organisation_0_0.csv", "id type name url",
          [(i, ["company", "university"][i % 2], f"org{i}",
            f"http://dbpedia.org/org{i}") for i in range(O)], "|")

    def pairs(n, m, k, a, b):
        """k deterministic (i, f(i,j)) pairs per left id."""
        out = []
        for i in range(n):
            for j in range(k):
                out.append((i, (i * a + j * b) % m))
        return sorted(set(out))

    write(f"{d}/person_knows_person_0_0.csv", "Person.id Person.id.1 creationDate",
          [(i, j, day(1)) for i, j in pairs(P, P, 2, 5, 7) if i != j], "|")
    write(f"{d}/comment_replyOf_comment_0_0.csv", "Comment.id Comment.id.1",
          [(i, (i * 3 + 1) % i) for i in range(1, C)], "|")
    write(f"{d}/comment_replyOf_post_0_0.csv", "Comment.id Post.id",
          [(i, i % PO) for i in range(C)], "|")
    write(f"{d}/place_isPartOf_place_0_0.csv", "Place.id Place.id.1",
          [(i, (i + 1) % PL) for i in range(PL) if (i + 1) % PL != i], "|")
    write(f"{d}/tagclass_isSubclassOf_tagclass_0_0.csv", "TagClass.id TagClass.id.1",
          [(i, 0) for i in range(1, TC)], "|")
    write(f"{d}/forum_hasTag_tag_0_0.csv", "Forum.id Tag.id", pairs(F, T, 2, 3, 5), "|")
    write(f"{d}/comment_hasTag_tag_0_0.csv", "Comment.id Tag.id", pairs(C, T, 1, 3, 1), "|")
    write(f"{d}/post_hasTag_tag_0_0.csv", "Post.id Tag.id", pairs(PO, T, 2, 5, 3), "|")
    write(f"{d}/forum_hasModerator_person_0_0.csv", "Forum.id Person.id",
          [(i, i % P) for i in range(F)], "|")
    write(f"{d}/person_hasInterest_tag_0_0.csv", "Person.id Tag.id",
          pairs(P, T, 2, 3, 5), "|")
    write(f"{d}/post_isLocatedIn_place_0_0.csv", "Post.id Place.id",
          [(i, i % PL) for i in range(PO)], "|")
    write(f"{d}/comment_isLocatedIn_place_0_0.csv", "Comment.id Place.id",
          [(i, (i * 2) % PL) for i in range(C)], "|")
    write(f"{d}/organisation_isLocatedIn_place_0_0.csv", "Organisation.id Place.id",
          [(i, i % PL) for i in range(O)], "|")
    write(f"{d}/person_isLocatedIn_place_0_0.csv", "Person.id Place.id",
          [(i, i % PL) for i in range(P)], "|")
    write(f"{d}/tag_hasType_tagclass_0_0.csv", "Tag.id TagClass.id",
          [(i, i % TC) for i in range(T)], "|")
    write(f"{d}/post_hasCreator_person_0_0.csv", "Post.id Person.id",
          [(i, i % P) for i in range(PO)], "|")
    write(f"{d}/comment_hasCreator_person_0_0.csv", "Comment.id Person.id",
          [(i, (i * 3) % P) for i in range(C)], "|")
    write(f"{d}/forum_containerOf_post_0_0.csv", "Forum.id Post.id",
          [(i % F, i) for i in range(PO)], "|")
    write(f"{d}/forum_hasMember_person_0_0.csv", "Forum.id Person.id joinDate",
          [(f, p, day(2)) for f, p in pairs(F, P, 4, 2, 3)], "|")
    write(f"{d}/person_workAt_organisation_0_0.csv",
          "Person.id Organisation.id workFrom",
          [(i, i % O, 2000 + i % 20) for i in range(P) if i % 2 == 0], "|")
    write(f"{d}/person_studyAt_organisation_0_0.csv",
          "Person.id Organisation.id classYear",
          [(i, (i + 1) % O, 1995 + i % 15) for i in range(P) if i % 2 == 1], "|")
    write(f"{d}/person_likes_comment_0_0.csv", "Person.id Comment.id creationDate",
          [(p, c, day(3)) for p, c in pairs(P, C, 2, 7, 9)], "|")
    write(f"{d}/person_likes_post_0_0.csv", "Person.id Post.id creationDate",
          [(p, po, day(4)) for p, po in pairs(P, PO, 2, 5, 11)], "|")


def gen_ogbn_mag() -> None:
    # ogbn_mag_small layout (ogbn_mag.py:75-108): 4 vertex csvs + 4 edge
    # csvs, comma-delimited, header row, first column = id.
    PA, AU, IN, FS = 30, 15, 5, 10
    d = "ogbn_mag_small"
    write(f"{d}/paper.csv", "id year venue",
          [(i, 2010 + i % 10, i % 7) for i in range(PA)], ",")
    write(f"{d}/author.csv", "id", [(i,) for i in range(AU)], ",")
    write(f"{d}/institution.csv", "id", [(i,) for i in range(IN)], ",")
    write(f"{d}/field_of_study.csv", "id", [(i,) for i in range(FS)], ",")
    write(f"{d}/author_affiliated_with_institution.csv", "src_id dst_id",
          [(i, i % IN) for i in range(AU)], ",")
    write(f"{d}/paper_has_topic_field_of_study.csv", "src_id dst_id",
          sorted({(i, (i * 3 + j) % FS) for i in range(PA) for j in range(2)}), ",")
    write(f"{d}/paper_cites_paper.csv", "src_id dst_id",
          sorted({(i, (i * 7 + k * 11) % i) for i in range(1, PA) for k in (1, 2)}),
          ","),
    write(f"{d}/author_writes_paper.csv", "src_id dst_id",
          sorted({(a, (a * 5 + j * 3) % PA) for a in range(AU) for j in range(4)}), ",")


def gen_simple_graphs() -> None:
    # single-label node/edge loaders (ppi.py, ogbn_arxiv.py,
    # ogbl_collab.py, ogbl_ddi.py, ogbn_proteins.py): nodes.csv/node.csv
    # with id (+ simple features), edge.csv with src_id,dst_id (+ props)
    def ring_plus_chords(n, a, b):
        es = {(i, (i + 1) % n) for i in range(n)}
        es |= {(i, (i * a + b) % n) for i in range(n) if (i * a + b) % n != i}
        return sorted(es)

    # ppi: node.csv (reference ppi.py uses node.csv/edge.csv)
    write("ppi/node.csv", "id f0 f1",
          [(i, i % 3, (i * 7) % 5) for i in range(50)], ",")
    write("ppi/edge.csv", "src_id dst_id", ring_plus_chords(50, 7, 3), ",")
    # ogbn_arxiv: citation DAG
    write("ogbn_arxiv/nodes.csv", "id year label",
          [(i, 2005 + i % 15, i % 40) for i in range(40)], ",")
    write("ogbn_arxiv/edge.csv", "src_id dst_id",
          sorted({(i, (i * 5 + k * 7) % i) for i in range(1, 40) for k in (1, 2)}),
          ",")
    # ogbl_collab
    write("ogbl_collab/nodes.csv", "id", [(i,) for i in range(40)], ",")
    write("ogbl_collab/edge.csv", "src_id dst_id", ring_plus_chords(40, 11, 5), ",")
    # ogbl_ddi
    write("ogbl_ddi/nodes.csv", "id", [(i,) for i in range(30)], ",")
    write("ogbl_ddi/edge.csv", "src_id dst_id", ring_plus_chords(30, 13, 7), ",")
    # ogbn_proteins: edges carry association-strength properties
    write("ogbn_proteins/nodes.csv", "id species",
          [(i, i % 8) for i in range(36)], ",")
    write("ogbn_proteins/edge.csv", "src_id dst_id w0 w1",
          [(s, d, round(0.1 + ((s + d) % 9) / 10, 1), (s * d) % 3)
           for s, d in ring_plus_chords(36, 5, 11)], ",")


if __name__ == "__main__":
    gen_cora()
    gen_u2i()
    gen_ldbc()
    gen_ogbn_mag()
    gen_simple_graphs()
    print("fixtures written under", os.path.abspath(ROOT))

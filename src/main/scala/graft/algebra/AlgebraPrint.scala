package graft.algebra

/** Indented algebra tree printer — the logical half of `explain` (reference
  * kineo-cli explain command, kasei/kineo `Sources/kineo-cli/main.swift:275-334`;
  * the physical half is Catalyst's own formatted plan). */
object AlgebraPrint {

  def pretty(a: Algebra): String = {
    val sb = new StringBuilder
    walk(a, 0, sb)
    sb.toString
  }

  private def line(sb: StringBuilder, depth: Int, s: String): Unit =
    sb.append("  " * depth).append(s).append('\n')

  private def node(n: Node): String = n match {
    case V(v) => "?" + v
    case T(t) => graft.sources.RdfIO.serializeTerm(t)
    case DefaultGraph => "DEFAULT"
  }

  private def walk(a: Algebra, d: Int, sb: StringBuilder): Unit = a match {
    case BGP(ps) =>
      line(sb, d, s"BGP (${ps.size} patterns)")
      ps.foreach(q => line(sb, d + 1,
        s"${node(q.s)} ${node(q.p)} ${node(q.o)} [${node(q.g)}]"))
    case APath(s, p, o, g) =>
      line(sb, d, s"Path ${node(s)} ${graft.parser.AlgebraText.path(p)} ${node(o)} [${node(g)}]")
    case AJoin(l, r) => line(sb, d, "Join"); walk(l, d + 1, sb); walk(r, d + 1, sb)
    case ALeftJoin(l, r, e) =>
      line(sb, d, "LeftJoin" + e.map(x => s" filter=${graft.parser.AlgebraText.expr(x)}").getOrElse(""))
      walk(l, d + 1, sb); walk(r, d + 1, sb)
    case AMinus(l, r) => line(sb, d, "Minus"); walk(l, d + 1, sb); walk(r, d + 1, sb)
    case AUnion(l, r) => line(sb, d, "Union"); walk(l, d + 1, sb); walk(r, d + 1, sb)
    case AFilter(e, c) =>
      line(sb, d, s"Filter ${graft.parser.AlgebraText.expr(e)}"); walk(c, d + 1, sb)
    case AExtend(c, v, e) =>
      line(sb, d, s"Extend ?$v ← ${graft.parser.AlgebraText.expr(e)}"); walk(c, d + 1, sb)
    case AProject(c, vs) =>
      line(sb, d, s"Project ${vs.map("?" + _).mkString(" ")}"); walk(c, d + 1, sb)
    case ADistinct(c) => line(sb, d, "Distinct"); walk(c, d + 1, sb)
    case AReduced(c) => line(sb, d, "Reduced"); walk(c, d + 1, sb)
    case ASlice(c, off, lim) =>
      line(sb, d, s"Slice offset=$off limit=$lim"); walk(c, d + 1, sb)
    case AOrderBy(c, ks) =>
      line(sb, d, "OrderBy " + ks.map(k =>
        (if (k.asc) "ASC " else "DESC ") + graft.parser.AlgebraText.expr(k.e)).mkString(", "))
      walk(c, d + 1, sb)
    case AGroup(c, keys, aggs) =>
      line(sb, d, s"Group keys=[${keys.map("?" + _).mkString(" ")}] " +
        aggs.map(x => s"?${x.out}←${x.fn.toUpperCase}" +
          (if (x.distinct) "·D" else "")).mkString(" "))
      walk(c, d + 1, sb)
    case AWindow(c, fns) =>
      line(sb, d, "Window " + fns.map(f => s"?${f.out}←${f.fn.toUpperCase}").mkString(" "))
      walk(c, d + 1, sb)
    case ATable(vs, rows) =>
      line(sb, d, s"Table vars=[${vs.map("?" + _).mkString(" ")}] rows=${rows.size}")
    case AService(e, c, silent) =>
      line(sb, d, s"Service ${node(e)}${if (silent) " SILENT" else ""}")
      walk(c, d + 1, sb)
    case AEnv(k, vs, _) =>
      line(sb, d, s"Env #$k [${vs.toSeq.sorted.map("?" + _).mkString(" ")}]")
  }
}

package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level ScalaTest tag for the long-running differential/fuzz suites.
 *
 * The default `sbt test` EXCLUDES tests carrying this tag (build.sbt:
 * `Tests.Argument(..., "-l", "graft.SlowTest")`) so the driver's test gate
 * finishes inside its budget; the full differential battery still runs in
 * the builder's own loop via
 *   sbt 'set Test / testOptions := Seq()' test
 * (everything) or
 *   sbt 'set Test / testOptions := Seq(Tests.Argument(TestFrameworks.ScalaTest, "-n", "graft.SlowTest"))' test
 * (only the slow suites).
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface SlowTest {}
